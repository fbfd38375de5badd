"""Weight-only int8 quantization for the bandwidth-bound decode path.

Single-stream decode at 3B on one chip is limited by streaming ~5 GB of bf16
weights per token through HBM (bench.py measures ~84% of that bound). Storing
the large matmul kernels as int8 with per-output-channel fp32 scales halves
the HBM traffic; the MXU consumes the int8 operand with the convert fused
into the operand load and the scale applied to the matmul *output* (valid
because scales are per output channel), so no dequantized weight copy ever
materializes.

This is an opt-in serving mode (``quantize_params``) — the bf16/fp32 path
remains the default and is the one held to the reference logit-fidelity bar;
quantized quality is validated distributionally (tests/test_quantization.py).
The reference has no quantization (its paper explicitly disables it as a
confound, Paper §3.1) — this is TPU-native serving headroom.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp


class QTensor(NamedTuple):
    """int8 values + per-output-channel fp32 scales.

    For a kernel of shape (..., in, out): q int8 (..., in, out), scale
    fp32 (..., 1, out). For the embedding (V, D): q (V, D), scale (V, 1) —
    per-row, serving both the lookup and the tied lm_head.
    """

    q: jnp.ndarray
    scale: jnp.ndarray


import functools


@functools.partial(jax.jit, static_argnames=("axis",))
def quantize_tensor(w: jnp.ndarray, axis: int) -> QTensor:
    """Symmetric int8 quantization with the scale reduced over ``axis``
    (the contraction axis), keeping one scale per output channel.

    Jitted so XLA fuses abs/max/round/clip into one pass — eager execution
    would materialize several fp32 copies of the (multi-GB, fused-kernel)
    weight and OOM a 16 GB chip."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return QTensor(q=q, scale=scale)


def dequantize(qt: QTensor, dtype=jnp.float32) -> jnp.ndarray:
    return (qt.q.astype(jnp.float32) * qt.scale).astype(dtype)


@functools.partial(jax.jit, static_argnames=("axis",))
def quantize_tensor_int4(w: jnp.ndarray, axis: int):
    """Symmetric int4 (values in [-7, 7]) with per-output-channel fp32
    scales, packed two values per int8 byte (ops.pallas_quant layout).

    ``jnp.int4`` is broken on this backend, so packing is manual; the decode
    matmul unpacks inside a Pallas kernel (HBM streams the packed bytes).
    """
    from paligemma_tpu.ops.pallas_quant import Q4Tensor, pack_int4

    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int8)
    return Q4Tensor(packed=pack_int4(q), scale=scale)


@functools.partial(jax.jit, static_argnames=("axis",))
def quantize_tensor_w4a8(w: jnp.ndarray, axis: int):
    """Symmetric int4 with per-output-channel fp32 scales in the w4a8 MXU
    packing (ops.pallas_quant.pack_int4_mxu): the matmul consumes the packed
    bytes directly as an s8 MXU operand with int8-quantized activations —
    the "s8xs8 MXU formulation" the round-3 int4 verdict called for."""
    from paligemma_tpu.ops.pallas_quant import Q4A8Tensor, pack_int4_mxu

    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int8)
    return Q4A8Tensor(packed=pack_int4_mxu(q), scale=scale)


@functools.partial(jax.jit, static_argnames=("axis",))
def quantize_tensor_w4a8_tiled(w: jnp.ndarray, axis: int):
    """w4a8 in the pack-time-tiled layout consumed by the fused MLP kernel
    (ops.pallas_quant.mlp_w4a8): one contiguous DMA tile per grid step."""
    from paligemma_tpu.ops.pallas_quant import (
        Q4A8TiledTensor, pack_int4_mxu_tiled, regroup_scales_stacked,
    )

    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int8)
    # block_o=1024 (1 MB DMA tiles, half the grid steps of the 512 default)
    # measured fastest in the fused stacked-MLP kernel together with the
    # bitcast unpack: ~60 vs ~80 us/layer at 3B (w4a8_kernel_bench.json mlp
    # arms). VMEM stays within budget at the kernel's bt <= 64 row cap.
    o = w.shape[-1]
    packed = pack_int4_mxu_tiled(q, block_o=1024 if o % 1024 == 0 else 0)
    # Stacked (L, in, out) trees: precompute the regrouped-scale form the
    # fused MLP kernel consumes, so the decode loop never rebuilds it
    # (it is NOT loop-hoisted by XLA: trace_decode_w4a8 reduce.99).
    scale2 = (
        regroup_scales_stacked(scale, packed.shape[1], packed.shape[4])
        if w.ndim == 3 else None
    )
    return Q4A8TiledTensor(packed=packed, scale=scale, scale2=scale2)


@jax.jit
def quantize_embed_w4(emb: jnp.ndarray):
    """Tied lm_head at 4 bits: (V, D) embedding -> transposed, vocab-padded
    ``Q4A8TiledTensor`` for the GEMV logits path (``gemma.logits`` routes
    decode-shaped calls through ``ops.pallas_quant.q4a8_matmul_tiled`` when
    ``runtime.lm_head_w4`` is set).

    The lm_head streams the whole embedding every decode step — 527 MB at
    int8, ~21% of the decode byte floor (REPORT.md lm_head section); 4 bits
    halves it. Per-vocab-row int4 scales; V is padded to a multiple of 1024
    so the pack keeps lane-aligned 1 MB DMA tiles (half=512) — pad columns
    carry zero weights (zero logits) and the consumer slices them off.
    This tensor serves ONLY the matmul; embedding lookups and matrix-shaped
    logits keep the int8 row-gatherable QTensor."""
    from paligemma_tpu.ops.pallas_quant import (
        Q4A8TiledTensor, pack_int4_mxu_tiled,
    )

    v, d = emb.shape
    wf = emb.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=1)
    scale = jnp.maximum(amax, 1e-8) / 7.0  # (V,)
    q = jnp.clip(jnp.round(wf / scale[:, None]), -7, 7).astype(jnp.int8)
    vp = ((v + 1023) // 1024) * 1024
    q_t = jnp.zeros((d, vp), jnp.int8).at[:, :v].set(q.T)
    s_p = jnp.ones((1, vp), jnp.float32).at[0, :v].set(scale)
    packed = pack_int4_mxu_tiled(q_t, block_o=1024)
    return Q4A8TiledTensor(packed=packed, scale=s_p, scale2=None)


def qproj(x: jnp.ndarray, qt: QTensor) -> jnp.ndarray:
    """x (B, T, in) @ QTensor (in, out) with output-channel rescale.

    Long-sequence (prefill) calls optionally route through ``qproj_a8`` —
    both-operands-int8 on the MXU — behind ``runtime.prefill_a8``. The
    T >= ``runtime.a8_min_seq`` gate is a static-shape decision at trace
    time, so decode/verify programs (T <= 13) always compile the exact
    weight-only path regardless of the flag.
    """
    from paligemma_tpu import runtime

    if runtime.prefill_a8 and x.shape[-2] >= runtime.a8_min_seq:
        return qproj_a8(x, qt)
    y = jnp.einsum(
        "btd,de->bte", x, qt.q.astype(x.dtype), preferred_element_type=jnp.float32
    )
    return (y * qt.scale.reshape(1, 1, -1)).astype(x.dtype)


def qproj_a8(x: jnp.ndarray, qt: QTensor) -> jnp.ndarray:
    """x (B, T, in) @ QTensor (in, out) with int8 on BOTH MXU operands.

    Activations are quantized symmetrically per token (abs-max over the
    feature axis), the matmul accumulates int8 x int8 -> int32 at the MXU's
    double int8 rate, and the output is rescaled by (per-token activation
    scale) x (per-output-channel weight scale). Prefill is compute-bound, so
    halving MXU cycles targets the serving engine's dominant device phase
    (REPORT.md round-4 decomposition: batched prefill = 62% of device time).

    Numerics: adds per-token activation quantization error on top of the
    weight quantization — NOT token-identical to bf16 (tolerance pinned in
    tests/test_quantization.py; opt-in via runtime.prefill_a8). The
    reference has no quantization at all (confound-excluded, Paper §3.1).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xscale = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.round(xf / xscale).astype(jnp.int8)
    acc = jnp.einsum(
        "btd,de->bte", xq, qt.q, preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * xscale * qt.scale.reshape(1, 1, -1)
    return y.astype(x.dtype)


def quantize_params(
    params: Dict[str, Any], llm_only: bool = True, mode: str = "int8"
) -> Dict[str, Any]:
    """Quantize the large kernels of a PaliGemma param pytree
    (returns a new tree; small tensors — norms, biases, position embeddings —
    stay in their original dtype).

    ``llm_only=True`` (default) quantizes just the decoder + embedding — the
    weights streamed every decode step. The vision tower runs once per image
    in compute-bound prefill where int8 dequant overhead actually *slows*
    prefill (measured: 58 ms int8-everything vs 39 ms bf16 vision), so it
    stays bf16 unless ``llm_only=False``.

    ``mode="int4"`` packs the decoder layer kernels to 4 bits (two values per
    int8 byte, unpacked inside a Pallas kernel — ops.pallas_quant); the
    embedding/lm_head stays int8 (row lookups need unpacked rows). int4 is an
    experiment arm: lower fidelity than int8, measured in REPORT.md.

    ``mode="w4a8"`` is the measured-best mixed scheme: gate_up/down (90% of
    the decoder's bytes) go to 4-bit in the tiled MXU packing, consumed by
    ONE fused Pallas MLP kernel per layer (gate_up -> gelu-gate -> requant
    -> down, all in VMEM — ops.pallas_quant.mlp_w4a8); qkv/o stay int8 on
    the zero-overhead XLA path, where a Pallas call's fixed ~25 us overhead
    exceeds their 4-bit byte saving (w4a8_kernel_bench.json: every flat
    kernel shape carries a ~0.1 ms fixed cost). Embedding/lm_head stays
    int8 (row lookups need unpacked rows).
    """
    assert mode in ("int8", "int4", "w4a8"), mode
    out = jax.tree.map(lambda x: x, params)  # shallow-ish copy

    # --- decoder ---
    llm = dict(out["llm"])
    layers = dict(llm["layers"])
    qfn = {"int8": quantize_tensor, "int4": quantize_tensor_int4,
           "w4a8": quantize_tensor}[mode]
    # In w4a8 mode gate_up/down go straight to the tiled 4-bit packing —
    # quantizing them to int8 first would transiently materialize ~1.8 GB
    # on-device only to be overwritten (ADVICE r4).
    int8_names = (("qkv", "o") if mode == "w4a8"
                  else ("qkv", "o", "gate_up", "down"))
    for name in int8_names:
        layers[name] = qfn(layers[name], axis=1)  # (L, in, out): reduce in
    if mode == "w4a8":
        for name in ("gate_up", "down"):
            layers[name] = quantize_tensor_w4a8_tiled(
                params["llm"]["layers"][name], axis=1
            )
            # int8 companions for LARGE-ROW calls (prefill ~272+ rows,
            # serving verify at 32 slots x k tokens): the w4a8 kernels are
            # GEMV-shaped — routing matrix-shaped calls through them made
            # serving 27x slower than int8 (130 vs 3584 useful tok/s,
            # measured r5). gemma._mlp picks the int8 GEMM path above
            # MLP_FUSED_MAX_ROWS; the ~1.2 GB extra HBM at 3B still lands
            # the tree well under the bf16 footprint.
            layers[name + "_i8"] = quantize_tensor(
                params["llm"]["layers"][name], axis=1
            )
        # 4-bit tied lm_head (GEMV-shaped logits only; gated at trace time
        # by runtime.lm_head_w4). +263 MB HBM at 3B next to the int8 embed
        # the lookup/matrix paths keep.
        llm["embed_w4"] = quantize_embed_w4(params["llm"]["embed"])
    llm["layers"] = layers
    # Per-row (V, 1) scales serve both the embedding lookup and the tied
    # lm_head; reuse the jitted kernel with axis=1.
    llm["embed"] = quantize_tensor(llm["embed"], axis=1)
    out["llm"] = llm

    if llm_only:
        return out

    # --- vision tower ---
    vis = dict(out["vision"])
    vlayers = jax.tree.map(lambda x: x, vis["layers"])
    for path in (("attn", "qkv"), ("attn", "o"),
                 ("mlp", "fc1"), ("mlp", "fc2")):
        node = vlayers[path[0]][path[1]]
        node["kernel"] = quantize_tensor(node["kernel"], axis=1)
    vis["layers"] = vlayers
    out["vision"] = vis

    proj = dict(out["projector"])
    proj["kernel"] = quantize_tensor(proj["kernel"], axis=0)  # (in, out)
    out["projector"] = proj
    return out


def params_bytes(params) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
