"""Runtime feature flags (trace-time switches).

``use_pallas_attention`` routes Gemma attention (decode, prefill, and batched
serving via the structured ``LengthMask``) plus SigLIP attention through the
Pallas kernels instead of the XLA einsum path. Both paths are numerically
validated against each other (tests/test_pallas_kernels.py). The default is
set from measured TPU data — see REPORT.md §Pallas-vs-XLA (run
``scripts/bench_decode_variants.py`` to reproduce).

``scan_unroll`` unrolls the decoder's ``lax.scan`` over layers by this factor,
letting the scheduler overlap the next layer's weight streaming with the
current layer's compute. Measured on TPU by the same script.

Set flags BEFORE the first jit trace of the functions they affect — flipping
them later does not invalidate already-compiled programs (tests call
``jax.clear_caches()`` around flag flips).
"""
from __future__ import annotations

import os

use_pallas_attention: bool = os.environ.get("PALIGEMMA_PALLAS_ATTENTION", "0") == "1"

scan_unroll: int = int(os.environ.get("PALIGEMMA_SCAN_UNROLL", "1"))

# Auto-route t>=this attention through the Pallas flash kernel even when
# ``use_pallas_attention`` is off: at long sequences XLA materializes the
# fp32 score matrix to HBM (trace_vision 896: 2.2 GB/layer, 79 of 100 ms)
# while the tuned-block flash kernel is 2.6x faster (flash_blocks_bench).
# At short sequences XLA's fused attention wins (REPORT.md r2) — hence a
# threshold, not a flag. 0 disables.
auto_flash_min_seq: int = int(
    os.environ.get("PALIGEMMA_AUTO_FLASH_MIN_SEQ", "2048")
)


# Opt-in: feed the MXU int8 on BOTH operands for long-sequence (prefill)
# projections of int8-quantized kernels, by dynamically quantizing the
# activations per token (see quantization.qproj_a8). Prefill is compute-bound
# (81% MXU at bf16 rate, REPORT.md prefill roofline) and the v5e MXU has 2x
# int8 throughput, so this targets the serving engine's dominant device phase.
# Gated on measurement (scripts/bench_mxu_int8.py); numerics are NOT
# token-identical to bf16 (activation quant error) — decode (short-T
# programs, < a8_min_seq tokens) always keeps the exact weight-only path.
prefill_a8: bool = os.environ.get("PALIGEMMA_PREFILL_A8", "0") == "1"

# Sequence-length threshold separating "compute-bound enough for a8" from the
# bandwidth-bound short programs (decode T=1, speculative verify T<=13).
a8_min_seq: int = 32

# Route decode-shaped logits (rows <= MLP_FUSED_MAX_ROWS) of a w4a8 tree
# through the 4-bit tied-lm_head GEMV (quantization.quantize_embed_w4 +
# ops.pallas_quant.q4a8_matmul_tiled): the lm_head streams 527 MB/token at
# int8 (~28% of the w4a8 decode bytes); 4 bits halves it. Adds int4 weight +
# int8 activation quantization error to the FINAL logits — token identity
# vs bf16 is an empirical gate (int4_bench.json lm_head_w4 arm), hence a
# flag. Matrix-shaped logits (verify, loss) keep the int8 einsum.
lm_head_w4: bool = os.environ.get("PALIGEMMA_LMHEAD_W4", "0") == "1"


def set_prefill_a8(enabled: bool) -> None:
    global prefill_a8
    prefill_a8 = enabled


def set_auto_flash_min_seq(n: int) -> None:
    global auto_flash_min_seq
    auto_flash_min_seq = n


def set_pallas_attention(enabled: bool) -> None:
    global use_pallas_attention
    use_pallas_attention = enabled


def set_scan_unroll(n: int) -> None:
    global scan_unroll
    scan_unroll = n


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
