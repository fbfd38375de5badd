"""Pallas int4 weight-only matmul for the bandwidth-bound decode path.

``jnp.int4`` is broken on this backend ("device: nullptr" — CLAUDE.md), so
int4 weights are stored as two 4-bit values packed per int8 byte and unpacked
*inside the kernel*: HBM traffic is the packed bytes (half of int8), the
unpack happens in VMEM/registers, and the MXU consumes bf16 operands.

Packing layout (block-local split-half, see ``pack_int4``): the output dim is
tiled into blocks of ``block_o`` channels; within a block, packed byte column
``c`` holds channel ``c`` in its low nibble and channel ``c + block_o/2`` in
its high nibble. A kernel program therefore unpacks its block into two
contiguous halves and issues two MXU dots — no lane interleaving, no
concatenation, exact channel order preserved.

Numerics: values in [-7, 7], per-output-channel fp32 scales applied to the
fp32 matmul output (same contract as the int8 path in
paligemma_tpu.quantization). Unpack int4 -> bf16 is exact.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.devices()[0].platform == "cpu"


class Q4Tensor(NamedTuple):
    """Packed int4 kernel: packed (..., in, out//2) int8, scale (..., 1, out)
    fp32, block-local split-half layout with block size ``block_o`` (static,
    carried by the caller — paligemma_tpu.quantization stores it)."""

    packed: jnp.ndarray
    scale: jnp.ndarray


BLOCK_O = 512  # output channels per kernel program (VMEM: ~5 MB/program)


def block_for(o: int) -> int:
    """Deterministic block size for an output dim: BLOCK_O when it divides,
    else the whole (even) dim as one block (tiny test geometries). Pack and
    matmul derive it identically, so it never needs to be stored."""
    assert o % 2 == 0, o
    return BLOCK_O if o % BLOCK_O == 0 else o


def pack_int4(q: jnp.ndarray, block_o: int = 0) -> jnp.ndarray:
    """Pack int8 values in [-7, 7] (..., D, O) -> (..., D, O//2) int8.

    Block-local split-half: within each block of ``block_o`` output channels,
    channel c rides the low nibble of packed column c, channel c + block_o/2
    the high nibble.
    """
    *lead, d, o = q.shape
    block_o = block_o or block_for(o)
    assert o % block_o == 0, (o, block_o)
    half = block_o // 2
    qb = q.reshape(*lead, d, o // block_o, block_o).astype(jnp.int32)
    lo = qb[..., :half] & 15
    hi = (qb[..., half:] & 15) << 4
    packed = (lo | hi).astype(jnp.int8)
    return packed.reshape(*lead, d, o // 2)


def unpack_int4(packed: jnp.ndarray, block_o: int = 0) -> jnp.ndarray:
    """Inverse of ``pack_int4`` (XLA reference path): (..., D, O//2) -> int8
    values (..., D, O)."""
    *lead, d, oh = packed.shape
    block_o = block_o or block_for(oh * 2)
    half = block_o // 2
    pb = packed.reshape(*lead, d, oh // half, half).astype(jnp.int32)
    lo = ((pb & 15) ^ 8) - 8
    hi = (((pb >> 4) & 15) ^ 8) - 8
    out = jnp.concatenate([lo, hi], axis=-1)  # (..., D, blocks, block_o)
    return out.reshape(*lead, d, oh * 2).astype(jnp.int8)


def _q4_kernel(x_ref, p_ref, s_ref, o_ref, acc_ref, *, half):
    """One (out-block, d-block) step: unpack (block_d, half) packed bytes
    into two bf16 halves, two MXU dots, fp32 accumulation across d-blocks
    (the contraction is tiled so prefill-sized x blocks fit VMEM).

    Scales arrive as (2, half) — lo-half scales in row 0, hi in row 1 —
    because a lane-offset slice of a (1, 2*half) vector is an invalid layout
    for Mosaic's broadcast (sublane slices are fine)."""
    db = pl.program_id(1)

    @pl.when(db == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[...]  # (T, block_d) bf16/f32
    p = p_ref[...].astype(jnp.int32)  # (block_d, half)
    # Shift-based sign extension: 2 ops per nibble (the VPU unpack chain is
    # the kernel's bottleneck — ~8 ops/byte over ~1 GB/token, REPORT.md).
    lo = ((p << 28) >> 28).astype(x.dtype)
    hi = ((p << 24) >> 28).astype(x.dtype)
    y_lo = jax.lax.dot_general(
        x, lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    y_hi = jax.lax.dot_general(
        x, hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc_ref[:, :half] += y_lo
    acc_ref[:, half:] += y_hi

    @pl.when(db == pl.num_programs(1) - 1)
    def _finalize():
        o_ref[:, :half] = (acc_ref[:, :half] * s_ref[0:1, :]).astype(o_ref.dtype)
        o_ref[:, half:] = (acc_ref[:, half:] * s_ref[1:2, :]).astype(o_ref.dtype)


def q4_matmul(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    scale: jnp.ndarray,
    block_o: int = 0,
) -> jnp.ndarray:
    """x (B, T, D) @ int4-packed (D, O//2) -> (B, T, O) in x.dtype.

    Streams only the packed bytes from HBM; unpack + two dots per out-block.
    """
    b, t, d = x.shape
    oh = packed.shape[-1]
    o = oh * 2
    block_o = block_o or block_for(o)
    assert o % block_o == 0
    half = block_o // 2
    block_d = 2048 if d % 2048 == 0 else d
    x2 = x.reshape(b * t, d)
    # Scales regrouped to (2, O/2): row 0 = every block's lo-half channels,
    # row 1 = hi-half — so a block's scales are a clean (2, half) tile.
    s2 = (
        scale.reshape(o // block_o, 2, half)
        .transpose(1, 0, 2)
        .reshape(2, o // 2)
        .astype(jnp.float32)
    )

    out = pl.pallas_call(
        functools.partial(_q4_kernel, half=half),
        grid=(o // block_o, d // block_d),
        in_specs=[
            pl.BlockSpec((b * t, block_d), lambda i, j: (0, j)),
            pl.BlockSpec((block_d, half), lambda i, j: (j, i)),
            pl.BlockSpec((2, half), lambda i, j: (0, i)),
        ],
        out_specs=pl.BlockSpec((b * t, block_o), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((b * t, o), x.dtype),
        scratch_shapes=[pltpu.VMEM((b * t, block_o), jnp.float32)],
        interpret=_interpret(),
    )(x2, packed, s2)

    return out.reshape(b, t, o)


def _q8_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref):
    """One (out-block, d-block) step of the int8 weight-only GEMV: convert
    the int8 block to the activation dtype in VMEM, one MXU dot, fp32
    accumulation across d-blocks, per-output-channel scales at the end."""
    db = pl.program_id(1)

    @pl.when(db == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[...]  # (T, block_d)
    w = q_ref[...].astype(x.dtype)  # (block_d, block_o) int8 -> bf16/f32
    acc_ref[:] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(db == pl.num_programs(1) - 1)
    def _finalize():
        o_ref[:] = (acc_ref[:] * s_ref[0:1, :]).astype(o_ref.dtype)


def q8_matmul(
    x: jnp.ndarray,
    q: jnp.ndarray,
    scale: jnp.ndarray,
    block_o: int = 0,
    block_d: int = 0,
) -> jnp.ndarray:
    """x (B, T, D) @ int8 (D, O) with fp32 per-output-channel scales.

    Explicitly tiled Pallas analog of ``quantization.qproj`` (XLA einsum) —
    exists to measure whether hand tiling beats XLA's scheduling on the
    weight-streaming-bound decode GEMVs (scripts/bench_q8.py; see REPORT.md
    for the verdict)."""
    b, t, d = x.shape
    o = q.shape[-1]
    block_o = block_o or (512 if o % 512 == 0 else o)
    block_d = block_d or (2048 if d % 2048 == 0 else d)
    assert o % block_o == 0 and d % block_d == 0, (o, block_o, d, block_d)
    x2 = x.reshape(b * t, d)
    s2 = scale.reshape(1, o).astype(jnp.float32)

    out = pl.pallas_call(
        _q8_kernel,
        grid=(o // block_o, d // block_d),
        in_specs=[
            pl.BlockSpec((b * t, block_d), lambda i, j: (0, j)),
            pl.BlockSpec((block_d, block_o), lambda i, j: (j, i)),
            pl.BlockSpec((1, block_o), lambda i, j: (0, i)),
        ],
        out_specs=pl.BlockSpec((b * t, block_o), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((b * t, o), x.dtype),
        scratch_shapes=[pltpu.VMEM((b * t, block_o), jnp.float32)],
        interpret=_interpret(),
    )(x2, q, s2)

    return out.reshape(b, t, o)


# ---------------------------------------------------------------------------
# w4a8: int4 weights + int8 activations on the MXU (round-4 re-litigation)
# ---------------------------------------------------------------------------
#
# The round-3 int4 kernel above lost to its VPU unpack chain (~7 int ops per
# packed byte feeding bf16 MXU operands — REPORT.md int4 section banked it at
# 4.47 ms/tok vs int8's 3.67, naming "an s8xs8 MXU formulation" as the only
# path forward). This is that formulation, unblocked by the a8 machinery
# (quantization.qproj_a8 proved s8xs8 MXU feeds on this backend):
#
#   byte = (q_hi << 4) | (q_lo + 8)        q in [-7, 7], so u_lo in [1, 15]
#                                          and the byte never wraps.
#   dot1 = P          @ x_s8 -> s32        packed bytes consumed DIRECTLY
#   dot2 = (P & 0xF0) @ x_s8 -> s32        = 16 * (q_hi @ x): masking the low
#                                          nibble of the sign-extended byte
#                                          leaves exactly 16*q_hi — the ONE
#                                          unpack op per packed byte
#   hi   = dot2                            (the /16 folds into the hi scales)
#   lo   = dot1 - dot2 - 8*rowsum(x)       exact integer nibble recovery
#
# vs the old kernel: one bitwise mask per packed byte (or per FOUR bytes in
# the int32-bitcast variant) on PACKED element counts instead of ~7 ops on
# unpacked, no int->bf16 operand converts, and s32-exact accumulation.
# Activations are quantized per row (same contract as qproj_a8); output is
# rescaled by (per-row activation scale) x (per-output-channel weight scale).
# Unpack-op variants (measured in w4a8_kernel_bench.json):
#   "and32"   widen->mask->trunc (3 VPU passes; always compiles)
#   "and8"    native s8 mask (1 pass, if Mosaic lowers s8 bitwise ops)
#   "bitcast" mask 4 packed bytes per int32 lane via pltpu.bitcast (~1/4 pass)


class Q4A8Tensor(NamedTuple):
    """MXU-layout packed int4 kernel: packed (..., in, out//2) int8 with
    byte = (q_hi << 4) | (q_lo + 8), scale (..., 1, out) fp32. Block-local
    split-half channel order (channel c -> lo nibble of packed column c,
    channel c + block/2 -> hi nibble), same ``block_for`` blocking as
    ``Q4Tensor``."""

    packed: jnp.ndarray
    scale: jnp.ndarray


def pack_int4_mxu(q: jnp.ndarray, block_o: int = 0) -> jnp.ndarray:
    """Pack int8 values in [-7, 7] (..., D, O) -> (..., D, O//2) int8 in the
    w4a8 MXU layout: within each ``block_o`` output-channel block, channel c
    rides the (offset +8) low nibble of packed column c and channel
    c + block_o/2 the signed high nibble."""
    *lead, d, o = q.shape
    block_o = block_o or block_for(o)
    assert o % block_o == 0, (o, block_o)
    half = block_o // 2
    qb = q.reshape(*lead, d, o // block_o, block_o).astype(jnp.int32)
    lo = qb[..., :half] + 8          # [1, 15]
    hi = (qb[..., half:] & 15) << 4  # signed nibble bits
    packed = (hi | lo).astype(jnp.int8)
    return packed.reshape(*lead, d, o // 2)


def unpack_int4_mxu(packed: jnp.ndarray, block_o: int = 0) -> jnp.ndarray:
    """Inverse of ``pack_int4_mxu`` (XLA reference path)."""
    *lead, d, oh = packed.shape
    block_o = block_o or block_for(oh * 2)
    half = block_o // 2
    pb = packed.reshape(*lead, d, oh // half, half).astype(jnp.int32)
    lo = (pb & 15) - 8
    hi = pb >> 4  # arithmetic shift of the sign-extended byte: exact q_hi
    out = jnp.concatenate([lo, hi], axis=-1)
    return out.reshape(*lead, d, oh * 2).astype(jnp.int8)


def quantize_rows_s8(x: jnp.ndarray):
    """Per-row symmetric int8 activation quantization (same contract as
    quantization.qproj_a8): returns (xq int8, xscale fp32 rows, rowsum s32)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xscale = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.round(xf / xscale).astype(jnp.int8)
    rowsum = jnp.sum(xq.astype(jnp.int32), axis=-1, keepdims=True)
    return xq, xscale, rowsum


def _mask_hi_nibbles(p: jnp.ndarray, mode: str) -> jnp.ndarray:
    """(block_d, half) packed int8 -> int8 tile equal to ``p & 0xF0``
    (= 16 * signed hi nibble, since the offset low nibble is >= 0)."""
    if mode == "and8":
        return p & jnp.int8(-16)
    if mode == "bitcast":
        # 4 packed bytes per int32 lane: the mask is byte-local, so the
        # int8<->int32 reinterpretation order doesn't matter.
        p32 = pltpu.bitcast(p, jnp.int32)
        mask = jnp.int32(-252645136)  # 0xF0F0F0F0
        return pltpu.bitcast(p32 & mask, jnp.int8)
    if mode == "noop":
        # Timing ablation ONLY (wrong math): dot2 re-reads p itself, isolating
        # the unpack cost from the two-dot structure (scripts/bench_w4a8.py).
        return p
    # "and32": widen -> mask -> truncate (always compiles)
    return (p.astype(jnp.int32) & -16).astype(jnp.int8)


def _q4a8_kernel(x_ref, p_ref, s_ref, xs_ref, rs_ref, o_ref,
                 acc1_ref, acc2_ref, *, half, unpack):
    """One (out-block, d-block) step: packed bytes feed the MXU directly
    (dot1); one bitwise-mask pass recovers 16*q_hi for dot2; s32
    accumulation across d-blocks; exact nibble recovery + fp32 rescale at
    the last d-block (the hi-channel scales arrive pre-divided by 16)."""
    db = pl.program_id(1)

    @pl.when(db == 0)
    def _init():
        acc1_ref[:] = jnp.zeros_like(acc1_ref)
        acc2_ref[:] = jnp.zeros_like(acc2_ref)

    x = x_ref[...]  # (T, block_d) int8
    p = p_ref[...]  # (block_d, half) int8 packed
    a = _mask_hi_nibbles(p, unpack)  # = 16 * q_hi, still int8
    acc1_ref[:] += jax.lax.dot_general(
        x, p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    acc2_ref[:] += jax.lax.dot_general(
        x, a, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )

    @pl.when(db == pl.num_programs(1) - 1)
    def _finalize():
        xs = xs_ref[...]  # (T, 1) fp32 activation row scales
        rs = rs_ref[...]  # (T, 1) s32 activation row sums
        lo = (acc1_ref[...] - acc2_ref[...] - 8 * rs).astype(jnp.float32)
        hi = acc2_ref[...].astype(jnp.float32)  # 16x folded into s_ref row 1
        o_ref[:, :half] = (lo * xs * s_ref[0:1, :]).astype(o_ref.dtype)
        o_ref[:, half:] = (hi * xs * s_ref[1:2, :]).astype(o_ref.dtype)


# Default unpack variant for the real backend (set from the measured winner
# in w4a8_kernel_bench.json; "and32" always compiles).
# Hardware default for the in-kernel hi-nibble mask. All three non-ablation
# modes are exact math; measured in the PRODUCTION stacked-MLP context
# (w4a8_kernel_bench.json mlp arms, overhead-corrected ~us/layer):
# and32+bo512 ~80, bitcast+bo1024 ~60 — the byte-local int32 mask avoids
# the widen->mask->truncate VPU passes. Interpret mode (CPU tests) always
# uses and32 (pltpu.bitcast is TPU-only).
UNPACK_MODE = "bitcast"


def q4a8_matmul(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    scale: jnp.ndarray,
    block_o: int = 0,
    unpack: str = "",
) -> jnp.ndarray:
    """x (B, T, D) @ w4a8-packed (D, O//2) -> (B, T, O) in x.dtype.

    HBM streams only the packed bytes (half of int8); both MXU operands are
    8-bit; the unpack is one bitwise-mask pass per packed byte. Exact integer
    arithmetic throughout (s32 accumulation; max |acc| < 2^28 at D=16384)."""
    b, t, d = x.shape
    oh = packed.shape[-1]
    o = oh * 2
    block_o = block_o or block_for(o)
    assert o % block_o == 0
    half = block_o // 2
    block_d = 2048 if d % 2048 == 0 else d
    # pltpu.bitcast is TPU-only; the interpreter falls back to the widened
    # mask (identical math).
    unpack = unpack or ("and32" if _interpret() else UNPACK_MODE)
    xq, xscale, rowsum = quantize_rows_s8(x.reshape(b * t, d))
    # Same (2, half) scale regrouping as q4_matmul: row 0 = lo-half channels,
    # row 1 = hi-half (lane-offset slices are invalid Mosaic broadcasts).
    # dot2 returns 16 * (q_hi @ x), so the hi-half scales absorb the /16.
    s2 = (
        scale.reshape(o // block_o, 2, half)
        .transpose(1, 0, 2)
        .reshape(2, o // 2)
        .astype(jnp.float32)
    )
    s2 = s2.at[1].divide(16.0)

    out = pl.pallas_call(
        functools.partial(_q4a8_kernel, half=half, unpack=unpack),
        grid=(o // block_o, d // block_d),
        in_specs=[
            pl.BlockSpec((b * t, block_d), lambda i, j: (0, j)),
            pl.BlockSpec((block_d, half), lambda i, j: (j, i)),
            pl.BlockSpec((2, half), lambda i, j: (0, i)),
            pl.BlockSpec((b * t, 1), lambda i, j: (0, 0)),
            pl.BlockSpec((b * t, 1), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((b * t, block_o), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((b * t, o), x.dtype),
        scratch_shapes=[pltpu.VMEM((b * t, half), jnp.int32),
                        pltpu.VMEM((b * t, half), jnp.int32)],
        interpret=_interpret(),
    )(xq, packed, s2, xscale, rowsum)

    return out.reshape(b, t, o)


def block_d_for(d: int) -> int:
    """Contraction-axis block size: 2048 when it divides (the model's hidden
    sizes), else the whole dim (tiny test geometries). Pack and matmul derive
    it identically."""
    return 2048 if d % 2048 == 0 else d


def pack_int4_mxu_tiled(q: jnp.ndarray, block_o: int = 0,
                        block_d: int = 0) -> jnp.ndarray:
    """``pack_int4_mxu`` + re-layout to per-program-contiguous tiles:
    (..., D, O) -> (..., O/block_o, D/block_d, block_d, block_o/2) int8.

    Why: a kernel block of the flat (D, O/2) packing is a column slice —
    ``half``-byte (256 B) DMA bursts with a row stride — while a tile here
    is one contiguous block_d*half-byte chunk per grid step. Measured
    (w4a8_kernel_bench.json): tiled ~= flat within run-to-run wobble at
    these shapes — Mosaic's prefetch pipeline evidently covers the strided
    bursts — so the tiled layout is kept for its *fused-MLP* consumers
    (mlp_w4a8 / mlp_w4a8_stacked need per-program-contiguous tiles for the
    two-phase grid), not for a standalone DMA-rate win. Same block-local
    split-half nibble order within each tile."""
    *lead, d, o = q.shape
    block_o = block_o or block_for(o)
    block_d = block_d or block_d_for(d)
    half = block_o // 2
    nb_o, nb_d = o // block_o, d // block_d
    flat = pack_int4_mxu(q, block_o)  # (..., d, nb_o*half)
    t = flat.reshape(*lead, nb_d, block_d, nb_o, half)
    nl = len(lead)
    perm = tuple(range(nl)) + (nl + 2, nl, nl + 1, nl + 3)
    return t.transpose(*perm)


def unpack_int4_mxu_tiled(packed: jnp.ndarray, block_o: int = 0) -> jnp.ndarray:
    """Inverse of ``pack_int4_mxu_tiled``: (..., nb_o, nb_d, block_d, half)
    -> int8 values (..., D, O)."""
    *lead, nb_o, nb_d, block_d, half = packed.shape
    nl = len(lead)
    perm = tuple(range(nl)) + (nl + 1, nl + 2, nl, nl + 3)
    flat = packed.transpose(*perm).reshape(
        *lead, nb_d * block_d, nb_o * half
    )
    return unpack_int4_mxu(flat, 2 * half)


def _q4a8_kernel_tiled(x_ref, p_ref, s_ref, xs_ref, rs_ref, o_ref,
                       acc1_ref, acc2_ref, *, half, unpack):
    """Same math as ``_q4a8_kernel``; the weight ref is one (1, 1, block_d,
    half) contiguous tile of the pack-time-tiled layout."""
    db = pl.program_id(1)

    @pl.when(db == 0)
    def _init():
        acc1_ref[:] = jnp.zeros_like(acc1_ref)
        acc2_ref[:] = jnp.zeros_like(acc2_ref)

    x = x_ref[...]  # (T, block_d) int8
    p = p_ref[0, 0]  # (block_d, half) int8 packed, contiguous in HBM
    a = _mask_hi_nibbles(p, unpack)
    acc1_ref[:] += jax.lax.dot_general(
        x, p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    acc2_ref[:] += jax.lax.dot_general(
        x, a, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )

    @pl.when(db == pl.num_programs(1) - 1)
    def _finalize():
        xs = xs_ref[...]
        rs = rs_ref[...]
        lo = (acc1_ref[...] - acc2_ref[...] - 8 * rs).astype(jnp.float32)
        hi = acc2_ref[...].astype(jnp.float32)
        o_ref[:, :half] = (lo * xs * s_ref[0:1, :]).astype(o_ref.dtype)
        o_ref[:, half:] = (hi * xs * s_ref[1:2, :]).astype(o_ref.dtype)


def q4a8_matmul_tiled(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    scale: jnp.ndarray,
    unpack: str = "",
    out_dtype=None,
) -> jnp.ndarray:
    """x (B, T, D) @ tiled w4a8 (nb_o, nb_d, block_d, half) -> (B, T, O).

    The serving-path w4a8 GEMV: contiguous weight tiles (full-rate DMA),
    packed bytes directly on the MXU, one bitwise mask per packed byte.
    ``out_dtype`` overrides the output dtype (the scale application is fp32
    inside the kernel either way) — the w4 lm_head consumer needs fp32
    logits (the parity invariant, reference modeling_gemma.py:396-418)."""
    b, t, d = x.shape
    nb_o, nb_d, block_d, half = packed.shape
    o = nb_o * 2 * half
    assert nb_d * block_d == d, (packed.shape, d)
    unpack = unpack or ("and32" if _interpret() else UNPACK_MODE)
    xq, xscale, rowsum = quantize_rows_s8(x.reshape(b * t, d))
    s2 = (
        scale.reshape(nb_o, 2, half)
        .transpose(1, 0, 2)
        .reshape(2, o // 2)
        .astype(jnp.float32)
    )
    s2 = s2.at[1].divide(16.0)

    out = pl.pallas_call(
        functools.partial(_q4a8_kernel_tiled, half=half, unpack=unpack),
        grid=(nb_o, nb_d),
        in_specs=[
            pl.BlockSpec((b * t, block_d), lambda i, j: (0, j)),
            pl.BlockSpec((1, 1, block_d, half), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((2, half), lambda i, j: (0, i)),
            pl.BlockSpec((b * t, 1), lambda i, j: (0, 0)),
            pl.BlockSpec((b * t, 1), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((b * t, 2 * half), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((b * t, o), out_dtype or x.dtype),
        scratch_shapes=[pltpu.VMEM((b * t, half), jnp.int32),
                        pltpu.VMEM((b * t, half), jnp.int32)],
        interpret=_interpret(),
    )(xq, packed, s2, xscale, rowsum)

    return out.reshape(b, t, o)


class Q4A8TiledTensor(NamedTuple):
    """Pack-time-tiled w4a8 kernel (``pack_int4_mxu_tiled`` layout):
    packed (..., O/block_o, D/block_d, block_d, block_o/2) int8,
    scale (..., 1, O) fp32. The serving consumer is the fused MLP kernel
    (``mlp_w4a8``) — one Pallas call per decoder layer instead of two.

    ``scale2`` (stacked trees only): the (L, 2, O/2) regrouped form the
    fused kernel consumes (``regroup_scales_stacked``), precomputed at
    quantize time — computing it per traced forward put a 4.7 MB fp32
    reshuffle INSIDE the decode while_loop (trace_decode_w4a8: reduce.99,
    0.024 ms/token at 3B)."""

    packed: jnp.ndarray
    scale: jnp.ndarray
    scale2: jnp.ndarray = None


def _regroup_scales(scale: jnp.ndarray, nb_o: int, half: int) -> jnp.ndarray:
    """(1, O) per-channel scales -> (2, O/2): row 0 = every block's lo-half
    channels, row 1 = hi-half pre-divided by 16 (dot2 returns 16*q_hi)."""
    s2 = (
        scale.reshape(nb_o, 2, half)
        .transpose(1, 0, 2)
        .reshape(2, nb_o * half)
        .astype(jnp.float32)
    )
    return s2.at[1].divide(16.0)


def _mlp_w4a8_kernel(
    xq_ref, gup_ref, gus_ref, xs_ref, xrs_ref, dwp_ref, dws_ref, o_ref,
    gu_ref, hq_ref, hs_ref, hrs_ref, a1g_ref, a2g_ref, a1d_ref, a2d_ref,
    *, a_steps, nb_gu, nb_dgu, half_gu, nb_dd, half_dn, inter, unpack,
):
    """Whole GeGLU MLP in one grid: phase A (steps < a_steps) runs the
    gate_up w4a8 GEMV into a VMEM scratch; the first phase-B step applies
    gelu-tanh gating and requantizes the hidden rows to int8 entirely in
    VMEM; phase B runs the down w4a8 GEMV. One Mosaic kernel launch per
    decoder layer — the per-call overhead (~25 us, w4a8_kernel_bench.json
    fixed cost) was eating the int4 byte savings at 4 calls/layer."""
    g = pl.program_id(0)

    @pl.when(g < a_steps)
    def _phase_a():
        ga = jnp.minimum(g, a_steps - 1)
        dgu = ga % nb_dgu

        @pl.when(dgu == 0)
        def _init():
            a1g_ref[:] = jnp.zeros_like(a1g_ref)
            a2g_ref[:] = jnp.zeros_like(a2g_ref)

        x = xq_ref[...]  # (T, bd_gu) int8
        p = gup_ref[0, 0]  # (bd_gu, half_gu) packed
        a = _mask_hi_nibbles(p, unpack)
        a1g_ref[:] += jax.lax.dot_general(
            x, p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        a2g_ref[:] += jax.lax.dot_general(
            x, a, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

        @pl.when(dgu == nb_dgu - 1)
        def _finalize_block():
            xs = xs_ref[...]  # (T, 1) fp32
            rs = xrs_ref[...]  # (T, 1) s32
            lo = (a1g_ref[...] - a2g_ref[...] - 8 * rs).astype(jnp.float32)
            hi = a2g_ref[...].astype(jnp.float32)
            val = jnp.concatenate(
                [
                    (lo * xs * gus_ref[0:1, :]).astype(gu_ref.dtype),
                    (hi * xs * gus_ref[1:2, :]).astype(gu_ref.dtype),
                ],
                axis=-1,
            )  # (T, 2*half_gu) — this out-block's gate_up activations
            gu_ref[pl.ds(ga // nb_dgu, 1), :, :] = val[None]

    @pl.when(g == a_steps)
    def _gate_and_quantize():
        # Same op order as the unfused path (gemma._mlp + quantize_rows_s8):
        # bf16 gate_up -> fp32 gelu-tanh -> bf16 act -> bf16 h -> fp32
        # quantize, so fused and unfused w4a8 are bit-identical.
        gu = jnp.concatenate(
            [gu_ref[c] for c in range(nb_gu)], axis=-1
        )  # (T, 2*inter), channel order restored
        gate = gu[:, :inter]
        up = gu[:, inter:]
        act = jax.nn.gelu(gate.astype(jnp.float32), approximate=True)
        h = (act.astype(gu.dtype) * up).astype(jnp.float32)
        amax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
        hs = jnp.maximum(amax, 1e-8) / 127.0
        hq = jnp.round(h / hs)
        hs_ref[:] = hs
        hrs_ref[:] = jnp.sum(hq, axis=-1, keepdims=True).astype(jnp.int32)
        bd_dn = inter // nb_dd
        for db in range(nb_dd):
            hq_ref[db] = hq[:, db * bd_dn:(db + 1) * bd_dn].astype(jnp.int8)

    @pl.when(g >= a_steps)
    def _phase_b():
        gb = jnp.maximum(g - a_steps, 0)
        dd = gb % nb_dd

        @pl.when(dd == 0)
        def _init():
            a1d_ref[:] = jnp.zeros_like(a1d_ref)
            a2d_ref[:] = jnp.zeros_like(a2d_ref)

        hq = hq_ref[pl.ds(dd, 1), :, :][0]
        p = dwp_ref[0, 0]  # (bd_dn, half_dn) packed
        a = _mask_hi_nibbles(p, unpack)
        a1d_ref[:] += jax.lax.dot_general(
            hq, p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        a2d_ref[:] += jax.lax.dot_general(
            hq, a, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

        @pl.when(dd == nb_dd - 1)
        def _finalize_block():
            hs = hs_ref[...]
            hrs = hrs_ref[...]
            lo = (a1d_ref[...] - a2d_ref[...] - 8 * hrs).astype(jnp.float32)
            hi = a2d_ref[...].astype(jnp.float32)
            o_ref[:, :half_dn] = (lo * hs * dws_ref[0:1, :]).astype(o_ref.dtype)
            o_ref[:, half_dn:] = (hi * hs * dws_ref[1:2, :]).astype(o_ref.dtype)


# Fused-MLP VMEM budget: gu scratch (T, 2*inter) bf16 + h intermediates cap
# the row count; above this the caller falls back to two tiled GEMV calls.
MLP_FUSED_MAX_ROWS = 64


def mlp_w4a8(
    x: jnp.ndarray,
    gu: "Q4A8TiledTensor",
    down: "Q4A8TiledTensor",
    inter: int,
    unpack: str = "",
) -> jnp.ndarray:
    """GeGLU MLP — down(gelu_tanh(gate(x)) * up(x)) — with both weights in
    tiled-w4a8 packing, fused into ONE Pallas call (reference semantics:
    modeling_gemma.py:122-134).

    HBM streams the packed nibbles once; the (T, 2*inter) gate_up
    activation and the requantized int8 hidden rows never leave VMEM.
    Matches the unfused pair of ``q4a8_matmul_tiled`` calls within one
    activation-quant step (tests/test_quantization.py pins rtol/atol 0.05;
    the interpreter skips an intermediate bf16 rounding of the gated
    activation, so bit-identity is expected on hardware but only closeness
    is pinned)."""
    b, t, d = x.shape
    bt = b * t
    nb_gu, nb_dgu, bd_gu, half_gu = gu.packed.shape
    nb_od, nb_dd, bd_dn, half_dn = down.packed.shape
    assert nb_dgu * bd_gu == d, (gu.packed.shape, d)
    assert nb_gu * 2 * half_gu == 2 * inter, (gu.packed.shape, inter)
    assert nb_dd * bd_dn == inter, (down.packed.shape, inter)
    o = nb_od * 2 * half_dn
    if bt > MLP_FUSED_MAX_ROWS:
        h = q4a8_matmul_tiled(x, gu.packed, gu.scale, unpack)
        act = jax.nn.gelu(
            h[..., :inter].astype(jnp.float32), approximate=True
        ).astype(x.dtype)
        return q4a8_matmul_tiled(
            act * h[..., inter:], down.packed, down.scale, unpack
        )
    unpack = unpack or ("and32" if _interpret() else UNPACK_MODE)
    xq, xscale, rowsum = quantize_rows_s8(x.reshape(bt, d))
    s2gu = _regroup_scales(gu.scale, nb_gu, half_gu)
    s2dn = _regroup_scales(down.scale, nb_od, half_dn)
    a_steps = nb_gu * nb_dgu
    b_steps = nb_od * nb_dd

    out = pl.pallas_call(
        functools.partial(
            _mlp_w4a8_kernel,
            a_steps=a_steps, nb_gu=nb_gu, nb_dgu=nb_dgu, half_gu=half_gu,
            nb_dd=nb_dd, half_dn=half_dn, inter=inter, unpack=unpack,
        ),
        grid=(a_steps + b_steps,),
        in_specs=[
            pl.BlockSpec(
                (bt, bd_gu),
                lambda g: (0, jnp.minimum(g, a_steps - 1) % nb_dgu),
            ),
            pl.BlockSpec(
                (1, 1, bd_gu, half_gu),
                lambda g: (
                    jnp.minimum(g, a_steps - 1) // nb_dgu,
                    jnp.minimum(g, a_steps - 1) % nb_dgu,
                    0,
                    0,
                ),
            ),
            pl.BlockSpec(
                (2, half_gu),
                lambda g: (0, jnp.minimum(g, a_steps - 1) // nb_dgu),
            ),
            pl.BlockSpec((bt, 1), lambda g: (0, 0)),
            pl.BlockSpec((bt, 1), lambda g: (0, 0)),
            pl.BlockSpec(
                (1, 1, bd_dn, half_dn),
                lambda g: (
                    jnp.maximum(g - a_steps, 0) // nb_dd,
                    jnp.maximum(g - a_steps, 0) % nb_dd,
                    0,
                    0,
                ),
            ),
            pl.BlockSpec(
                (2, half_dn),
                lambda g: (0, jnp.maximum(g - a_steps, 0) // nb_dd),
            ),
        ],
        out_specs=pl.BlockSpec(
            (bt, 2 * half_dn),
            lambda g: (0, jnp.maximum(g - a_steps, 0) // nb_dd),
        ),
        out_shape=jax.ShapeDtypeStruct((bt, o), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((nb_gu, bt, 2 * half_gu), x.dtype),   # gate_up rows
            pltpu.VMEM((nb_dd, bt, inter // nb_dd), jnp.int8),  # hq tiles
            pltpu.VMEM((bt, 1), jnp.float32),                # h row scales
            pltpu.VMEM((bt, 1), jnp.int32),                  # h row sums
            pltpu.VMEM((bt, half_gu), jnp.int32),
            pltpu.VMEM((bt, half_gu), jnp.int32),
            pltpu.VMEM((bt, half_dn), jnp.int32),
            pltpu.VMEM((bt, half_dn), jnp.int32),
        ],
        interpret=_interpret(),
    )(xq, gu.packed, s2gu, xscale, rowsum, down.packed, s2dn)

    return out.reshape(b, t, o)


def regroup_scales_stacked(scale: jnp.ndarray, nb_o: int, half: int) -> jnp.ndarray:
    """Stacked-layer form of ``_regroup_scales``: (L, 1, O) per-channel
    scales -> (L, 2, O/2) with the hi-half row pre-divided by 16. Runs once
    per traced program (outside the layer scan)."""
    l = scale.shape[0]
    s2 = (
        scale.reshape(l, nb_o, 2, half)
        .transpose(0, 2, 1, 3)
        .reshape(l, 2, nb_o * half)
        .astype(jnp.float32)
    )
    return s2.at[:, 1].divide(16.0)


def _mlp_w4a8_kernel_stacked(
    idx_ref, xq_ref, gup_ref, gus_ref, xs_ref, xrs_ref, dwp_ref, dws_ref,
    o_ref,
    gu_ref, hq_ref, hs_ref, hrs_ref, a1g_ref, a2g_ref, a1d_ref, a2d_ref,
    *, a_steps, nb_gu, nb_dgu, half_gu, nb_dd, half_dn, inter, unpack,
):
    """``_mlp_w4a8_kernel`` with the layer picked by a scalar-prefetch index
    into the FULL stacked (L, ...) weight arrays. The decoder's ``lax.scan``
    otherwise dynamic-slices each layer's packed tensor out of the stack,
    and a slice feeding a Mosaic custom call is materialized as an HBM->HBM
    copy (a Pallas operand can't fuse a slice) — ~48 MB/layer/token at 3B,
    which is where the round-4 w4a8 model-level gap lived (VERDICT r4 #1).
    Here the BlockSpec index maps address the stack directly, so HBM
    streams exactly the packed nibbles."""
    g = pl.program_id(0)

    @pl.when(g < a_steps)
    def _phase_a():
        ga = jnp.minimum(g, a_steps - 1)
        dgu = ga % nb_dgu

        @pl.when(dgu == 0)
        def _init():
            a1g_ref[:] = jnp.zeros_like(a1g_ref)
            a2g_ref[:] = jnp.zeros_like(a2g_ref)

        x = xq_ref[...]
        p = gup_ref[0, 0, 0]  # (bd_gu, half_gu) packed
        a = _mask_hi_nibbles(p, unpack)
        a1g_ref[:] += jax.lax.dot_general(
            x, p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        a2g_ref[:] += jax.lax.dot_general(
            x, a, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

        @pl.when(dgu == nb_dgu - 1)
        def _finalize_block():
            xs = xs_ref[...]
            rs = xrs_ref[...]
            lo = (a1g_ref[...] - a2g_ref[...] - 8 * rs).astype(jnp.float32)
            hi = a2g_ref[...].astype(jnp.float32)
            val = jnp.concatenate(
                [
                    (lo * xs * gus_ref[0, 0:1, :]).astype(gu_ref.dtype),
                    (hi * xs * gus_ref[0, 1:2, :]).astype(gu_ref.dtype),
                ],
                axis=-1,
            )
            gu_ref[pl.ds(ga // nb_dgu, 1), :, :] = val[None]

    @pl.when(g == a_steps)
    def _gate_and_quantize():
        gu = jnp.concatenate(
            [gu_ref[c] for c in range(nb_gu)], axis=-1
        )
        gate = gu[:, :inter]
        up = gu[:, inter:]
        act = jax.nn.gelu(gate.astype(jnp.float32), approximate=True)
        h = (act.astype(gu.dtype) * up).astype(jnp.float32)
        amax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
        hs = jnp.maximum(amax, 1e-8) / 127.0
        hq = jnp.round(h / hs)
        hs_ref[:] = hs
        hrs_ref[:] = jnp.sum(hq, axis=-1, keepdims=True).astype(jnp.int32)
        bd_dn = inter // nb_dd
        for db in range(nb_dd):
            hq_ref[db] = hq[:, db * bd_dn:(db + 1) * bd_dn].astype(jnp.int8)

    @pl.when(g >= a_steps)
    def _phase_b():
        gb = jnp.maximum(g - a_steps, 0)
        dd = gb % nb_dd

        @pl.when(dd == 0)
        def _init():
            a1d_ref[:] = jnp.zeros_like(a1d_ref)
            a2d_ref[:] = jnp.zeros_like(a2d_ref)

        hq = hq_ref[pl.ds(dd, 1), :, :][0]
        p = dwp_ref[0, 0, 0]
        a = _mask_hi_nibbles(p, unpack)
        a1d_ref[:] += jax.lax.dot_general(
            hq, p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        a2d_ref[:] += jax.lax.dot_general(
            hq, a, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

        @pl.when(dd == nb_dd - 1)
        def _finalize_block():
            hs = hs_ref[...]
            hrs = hrs_ref[...]
            lo = (a1d_ref[...] - a2d_ref[...] - 8 * hrs).astype(jnp.float32)
            hi = a2d_ref[...].astype(jnp.float32)
            o_ref[:, :half_dn] = (lo * hs * dws_ref[0, 0:1, :]).astype(o_ref.dtype)
            o_ref[:, half_dn:] = (hi * hs * dws_ref[0, 1:2, :]).astype(o_ref.dtype)


def mlp_w4a8_stacked(
    x: jnp.ndarray,
    gu_packed: jnp.ndarray,
    gu_s2: jnp.ndarray,
    dn_packed: jnp.ndarray,
    dn_s2: jnp.ndarray,
    layer_idx: jnp.ndarray,
    inter: int,
    unpack: str = "",
) -> jnp.ndarray:
    """Fused GeGLU MLP over the FULL stacked w4a8 weights, one layer selected
    by ``layer_idx`` via scalar prefetch.

    Args:
      x: (B, T, D) activations (bt <= MLP_FUSED_MAX_ROWS; caller gates).
      gu_packed: (L, nb_gu, nb_dgu, bd_gu, half_gu) int8 — the whole stack in
        ``pack_int4_mxu_tiled`` layout (NOT a per-layer slice).
      gu_s2 / dn_s2: (L, 2, O/2) regrouped scales (``regroup_scales_stacked``).
      dn_packed: (L, nb_od, nb_dd, bd_dn, half_dn) int8.
      layer_idx: scalar int32 — which layer of the stack to run.

    Same math as ``mlp_w4a8``; exists so the decoder's per-layer scan never
    slices a multi-MB packed tensor in front of a Pallas call."""
    b, t, d = x.shape
    bt = b * t
    assert bt <= MLP_FUSED_MAX_ROWS, (bt, MLP_FUSED_MAX_ROWS)
    _, nb_gu, nb_dgu, bd_gu, half_gu = gu_packed.shape
    _, nb_od, nb_dd, bd_dn, half_dn = dn_packed.shape
    assert nb_dgu * bd_gu == d, (gu_packed.shape, d)
    assert nb_gu * 2 * half_gu == 2 * inter, (gu_packed.shape, inter)
    assert nb_dd * bd_dn == inter, (dn_packed.shape, inter)
    o = nb_od * 2 * half_dn
    unpack = unpack or ("and32" if _interpret() else UNPACK_MODE)
    xq, xscale, rowsum = quantize_rows_s8(x.reshape(bt, d))
    a_steps = nb_gu * nb_dgu
    b_steps = nb_od * nb_dd
    idx = jnp.reshape(layer_idx, (1,)).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(a_steps + b_steps,),
        in_specs=[
            pl.BlockSpec(
                (bt, bd_gu),
                lambda g, li: (0, jnp.minimum(g, a_steps - 1) % nb_dgu),
            ),
            pl.BlockSpec(
                (1, 1, 1, bd_gu, half_gu),
                lambda g, li: (
                    li[0],
                    jnp.minimum(g, a_steps - 1) // nb_dgu,
                    jnp.minimum(g, a_steps - 1) % nb_dgu,
                    0,
                    0,
                ),
            ),
            pl.BlockSpec(
                (1, 2, half_gu),
                lambda g, li: (
                    li[0], 0, jnp.minimum(g, a_steps - 1) // nb_dgu
                ),
            ),
            pl.BlockSpec((bt, 1), lambda g, li: (0, 0)),
            pl.BlockSpec((bt, 1), lambda g, li: (0, 0)),
            pl.BlockSpec(
                (1, 1, 1, bd_dn, half_dn),
                lambda g, li: (
                    li[0],
                    jnp.maximum(g - a_steps, 0) // nb_dd,
                    jnp.maximum(g - a_steps, 0) % nb_dd,
                    0,
                    0,
                ),
            ),
            pl.BlockSpec(
                (1, 2, half_dn),
                lambda g, li: (
                    li[0], 0, jnp.maximum(g - a_steps, 0) // nb_dd
                ),
            ),
        ],
        out_specs=pl.BlockSpec(
            (bt, 2 * half_dn),
            lambda g, li: (0, jnp.maximum(g - a_steps, 0) // nb_dd),
        ),
        scratch_shapes=[
            pltpu.VMEM((nb_gu, bt, 2 * half_gu), x.dtype),
            pltpu.VMEM((nb_dd, bt, inter // nb_dd), jnp.int8),
            pltpu.VMEM((bt, 1), jnp.float32),
            pltpu.VMEM((bt, 1), jnp.int32),
            pltpu.VMEM((bt, half_gu), jnp.int32),
            pltpu.VMEM((bt, half_gu), jnp.int32),
            pltpu.VMEM((bt, half_dn), jnp.int32),
            pltpu.VMEM((bt, half_dn), jnp.int32),
        ],
    )

    out = pl.pallas_call(
        functools.partial(
            _mlp_w4a8_kernel_stacked,
            a_steps=a_steps, nb_gu=nb_gu, nb_dgu=nb_dgu, half_gu=half_gu,
            nb_dd=nb_dd, half_dn=half_dn, inter=inter, unpack=unpack,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bt, o), x.dtype),
        interpret=_interpret(),
    )(idx, xq, gu_packed, gu_s2, xscale, rowsum, dn_packed, dn_s2)

    return out.reshape(b, t, o)


def q4a8_matmul_xla(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    scale: jnp.ndarray,
    block_o: int = 0,
) -> jnp.ndarray:
    """XLA reference path for w4a8: unpack to int8, quantize activations the
    same way, s8xs8 einsum. Materializes the unpacked tensor — correctness
    oracle, not a serving path."""
    w = unpack_int4_mxu(packed, block_o)
    xq, xscale, _ = quantize_rows_s8(x.reshape(-1, x.shape[-1]))
    acc = jnp.einsum("td,de->te", xq, w, preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xscale * scale.reshape(1, -1)
    return y.astype(x.dtype).reshape(*x.shape[:-1], w.shape[-1])


def q4_matmul_xla(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    scale: jnp.ndarray,
    block_o: int = 0,
) -> jnp.ndarray:
    """XLA reference path: unpack to int8 then einsum (materializes the
    unpacked tensor — measured against the kernel in REPORT.md)."""
    w = unpack_int4(packed, block_o).astype(x.dtype)
    y = jnp.einsum("btd,de->bte", x, w, preferred_element_type=jnp.float32)
    return (y * scale.reshape(1, 1, -1)).astype(x.dtype)
