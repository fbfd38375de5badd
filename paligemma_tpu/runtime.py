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


def enable_compilation_cache(path: str = "/tmp/paligemma_tpu_xla_cache") -> None:
    """Persistent XLA compilation cache (survives processes).

    On the tunneled TPU backend remote compiles cost minutes; the persistent
    cache cuts repeat-process compile time roughly in half (measured
    78.6 s -> 39 s for the tiny forward). Called by every entry point
    (bench, harness, CLI, server); safe no-op where unsupported.
    """
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax
        pass
