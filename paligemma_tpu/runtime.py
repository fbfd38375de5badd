"""Runtime feature flags (trace-time switches).

``use_pallas_attention`` routes Gemma decode attention and prefill/vision
attention through the Pallas kernels instead of the XLA einsum path. Both
paths are numerically validated against each other (tests/test_pallas_kernels
.py); the default is chosen by benchmark (bench.py compares them).

Set flags BEFORE the first jit trace of the functions they affect — flipping
them later does not invalidate already-compiled programs.
"""
from __future__ import annotations

import os

use_pallas_attention: bool = os.environ.get("PALIGEMMA_PALLAS_ATTENTION", "0") == "1"


def set_pallas_attention(enabled: bool) -> None:
    global use_pallas_attention
    use_pallas_attention = enabled


def enable_compilation_cache(path: str = None) -> None:
    """Persistent XLA compilation cache (survives processes).

    On the tunneled TPU backend remote compiles cost minutes; the persistent
    cache cuts repeat-process compile time roughly in half (measured
    78.6 s -> 39 s for the tiny forward; bench param-init 87 s -> 17.5 s).

    Called once at ``paligemma_tpu`` import, so every entry point gets it.
    Respects an existing user setting (no-op if ``jax_compilation_cache_dir``
    is already configured). Default path is per-user (multi-user hosts:
    another user's dir would be unwritable and is a deserialization-poisoning
    surface); override with ``PALIGEMMA_XLA_CACHE_DIR``.
    """
    import getpass
    import tempfile

    import jax

    if path is None:
        path = os.environ.get("PALIGEMMA_XLA_CACHE_DIR")
    if path is None:
        try:
            user = getpass.getuser()
        except Exception:  # pragma: no cover
            user = str(os.getuid()) if hasattr(os, "getuid") else "user"
        path = os.path.join(
            tempfile.gettempdir(), f"paligemma_tpu_xla_cache_{user}"
        )
    try:
        if jax.config.jax_compilation_cache_dir:  # user already configured it
            return
        # Pure-CPU sessions (tests, --only_cpu) skip the cache: CPU compiles
        # are fast, and reloading CPU AOT results across XLA flag variations
        # spams machine-feature warnings. The win is TPU remote compiles.
        platforms = jax.config.jax_platforms or ""
        if platforms == "cpu" and "PALIGEMMA_XLA_CACHE_DIR" not in os.environ:
            return
        jax.config.update("jax_compilation_cache_dir", path)
    except Exception:  # pragma: no cover - older jax
        pass
