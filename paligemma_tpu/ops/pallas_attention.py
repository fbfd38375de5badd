"""Pallas TPU attention kernels.

Two kernels cover the model's attention shapes (see /opt/skills/guides/
pallas_guide.md for the hardware model):

- ``flash_attention``: blocked bidirectional attention with an online-softmax
  running maximum — used for SigLIP's full MHA over 256 patches and Gemma's
  prefix-LM prefill (both are *unmasked* full attention; PaliGemma's prefix-LM
  mask is all-zeros over valid positions, reference: modeling_gemma.py:506-514).
  Grid over (batch, q-head, q-block); K/V stream through VMEM in blocks with a
  fp32 accumulator, so the (T, S) score matrix never hits HBM. GQA is handled
  by indexing the kv-head as ``q_head // group`` in the BlockSpec index maps.

- ``decode_attention``: single-query GQA against the preallocated KV cache
  with a validity mask over unwritten slots. One program per (batch, kv-head);
  the G=8 query group rides the MXU as a skinny (G, S) matmul; everything fits
  VMEM (S<=2048, hd=256 -> 1 MB per K/V panel).

Numerics match the XLA path bit-for-bit in structure: fp32 scores, fp32
softmax, probabilities cast back to the activation dtype before the PV
matmul with fp32 accumulation (reference: modeling_gemma.py:266-277).
Tested against ``paligemma_tpu.ops.attention`` in interpret mode on CPU and
compiled on TPU.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(np.finfo(np.float32).max)


def _interpret() -> bool:
    return jax.devices()[0].platform == "cpu"


# ---------------------------------------------------------------------------
# Flash attention (prefill / vision encoder)
# ---------------------------------------------------------------------------


def _flash_kernel(valid_ref, win_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *, scale, block_k):
    """One (batch, head, q-block, k-block) step of online-softmax attention.

    Grid: (B, H, num_q_blocks, num_k_blocks); the k-block axis is innermost so
    the fp32 accumulator carries across it in VMEM scratch. Visibility is
    LengthMask semantics: row b sees kv ``[0, valid[b]) ∪ [win[0], win[1])``.
    """
    kb = pl.program_id(3)
    valid = valid_ref[pl.program_id(0)]  # per-row (B,) validity
    w0, w1 = win_ref[0], win_ref[1]

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0, 0, ...]  # (bq, hd)
    k = k_ref[0, 0, ...]  # (bk, hd)
    v = v_ref[0, 0, ...]  # (bk, hd)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bk) fp32
    s = s * scale

    # Mask kv positions beyond valid (padding tail), minus the shared window.
    offs = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    visible = (offs < valid) | ((offs >= w0) & (offs < w1))
    s = jnp.where(visible, s, NEG_INF)

    m_prev = m_ref[:]  # (bq, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    # Zero masked positions explicitly: when an entire block is masked,
    # s - m_new == 0 would otherwise make exp() emit 1s (garbage average).
    p = jnp.where(s > NEG_INF * 0.5, jnp.exp(s - m_new), 0.0)  # (bq, bk) fp32
    alpha = jnp.exp(m_prev - m_new)  # (bq, 1)

    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, hd)
    acc_ref[:] = acc_ref[:] * alpha + pv
    m_ref[:] = m_new

    @pl.when(kb == pl.num_programs(3) - 1)
    def _finalize():
        o_ref[0, 0, ...] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    valid_len: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    gen_start=None,
    gen_end=None,
) -> jnp.ndarray:
    """Bidirectional (prefix-LM) flash attention with GQA support.

    Args:
      q: (B, T, H, D); k, v: (B, S, Hkv, D) with H % Hkv == 0.
      valid_len: optional scalar or (B,) int32: row b's kv positions >=
        valid_len[b] are masked (right-padded batches).
      block_q, block_k: grid block sizes; default auto-scales with sequence
        length — the 128x128 default was the WHOLE of the kernel's round-2
        "2.2x slower at 4096" negative result (block sweep,
        flash_blocks_bench.json: 128x128 = 10.8 ms vs 512x1024 = 4.25 vs
        XLA 11.0 at the 896-vision shape).
    Returns:
      (B, T, H, D) in q.dtype. T and S are padded internally to block size.
    """
    b, t, h, d = q.shape
    s_len = k.shape[1]
    hkv = k.shape[2]
    g = h // hkv
    scale = d**-0.5 if scale is None else scale
    def _auto_block(length: int, prefer: int) -> int:
        # Largest preferred block whose padding waste stays under ~1/8 of
        # the sequence — big blocks won the 4096 sweep, but at lengths just
        # above a block multiple the pad rows would eat the gain.
        for cand in (prefer, prefer // 2, prefer // 4):
            if cand <= 128:
                break
            if -(-length // cand) * cand - length <= length // 8:
                return cand
        return 128

    if block_q is None:
        block_q = _auto_block(t, 512) if t >= 512 else 128
    if block_k is None:
        block_k = _auto_block(s_len, 1024) if s_len >= 1024 else 128

    t_pad = -(-t // block_q) * block_q
    s_pad = -(-s_len // block_k) * block_k
    qp = jnp.pad(q, ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, s_pad - s_len), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, s_pad - s_len), (0, 0), (0, 0)))
    # (B, H, T, D) / (B, Hkv, S, D) layouts for blocking.
    qp = qp.transpose(0, 2, 1, 3)
    kp = kp.transpose(0, 2, 1, 3)
    vp = vp.transpose(0, 2, 1, 3)

    if valid_len is None:
        valid = jnp.full((b,), s_len, jnp.int32)
    else:
        valid = jnp.asarray(valid_len, jnp.int32).reshape(-1)
        if valid.shape[0] == 1 and b > 1:
            valid = jnp.broadcast_to(valid, (b,))
        assert valid.shape[0] == b, (valid.shape, b)
    zero = jnp.zeros((), jnp.int32)
    win = jnp.stack(
        [
            jnp.asarray(gen_start, jnp.int32) if gen_start is not None else zero,
            jnp.asarray(gen_end, jnp.int32) if gen_end is not None else zero,
        ]
    )

    grid = (b, h, t_pad // block_q, s_pad // block_k)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_k=block_k),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, block_q, d), lambda bi, hi, qi, ki, *_: (bi, hi, qi, 0)
                ),
                pl.BlockSpec(
                    (1, 1, block_k, d), lambda bi, hi, qi, ki, *_: (bi, hi // g, ki, 0)
                ),
                pl.BlockSpec(
                    (1, 1, block_k, d), lambda bi, hi, qi, ki, *_: (bi, hi // g, ki, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, block_q, d), lambda bi, hi, qi, ki, *_: (bi, hi, qi, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q, d), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, t_pad, d), q.dtype),
        interpret=_interpret(),
    )(valid, win, qp, kp, vp)

    return out.transpose(0, 2, 1, 3)[:, :t]


# ---------------------------------------------------------------------------
# Decode attention (single query vs KV cache)
# ---------------------------------------------------------------------------


def _decode_kernel(len_ref, win_ref, q_ref, k_ref, v_ref, o_ref, *, scale):
    """One (batch, kv-head) program: (G, D) queries vs the (S, D) cache panel.

    Visibility is reconstructed from three scalars (LengthMask semantics):
    row ``b`` sees positions ``[0, len[b]) ∪ [win[0], win[1])`` — no dense
    mask ever leaves SMEM.
    """
    bi = pl.program_id(0)
    valid = len_ref[bi]
    w0, w1 = win_ref[0], win_ref[1]
    q = q_ref[0, 0, ...]  # (G, D)
    k = k_ref[0, 0, ...]  # (S, D)
    v = v_ref[0, 0, ...]  # (S, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (G, S)
    s = s * scale
    pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    visible = (pos < valid) | ((pos >= w0) & (pos < w1))
    s = jnp.where(visible, s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (G, D)
    o_ref[0, 0, ...] = o.astype(o_ref.dtype)


def decode_attention(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    valid_len: jnp.ndarray,
    scale: Optional[float] = None,
    gen_start=None,
    gen_end=None,
) -> jnp.ndarray:
    """Single-token GQA decode attention against the preallocated cache.

    Args:
      q: (B, 1, H, D) this step's queries (RoPE already applied).
      k_cache, v_cache: (B, S, Hkv, D) — the full cache buffers.
      valid_len: () or (B,) int32 — row b sees positions < valid_len[b] ...
      gen_start, gen_end: optional () int32 — ... plus the shared window
        [gen_start, gen_end) (batched serving's generated slots; pad holes
        between a row's prompt and the window stay masked).
    Returns:
      (B, 1, H, D) in q.dtype.
    """
    b, t, h, d = q.shape
    assert t == 1
    s_len = k_cache.shape[1]
    hkv = k_cache.shape[2]
    g = h // hkv
    scale = d**-0.5 if scale is None else scale

    qg = q.reshape(b, hkv, g, d)
    kt = k_cache.transpose(0, 2, 1, 3)  # (B, Hkv, S, D)
    vt = v_cache.transpose(0, 2, 1, 3)
    valid = jnp.asarray(valid_len, jnp.int32).reshape(-1)
    if valid.shape[0] == 1 and b > 1:
        valid = jnp.broadcast_to(valid, (b,))
    zero = jnp.zeros((), jnp.int32)
    win = jnp.stack(
        [
            jnp.asarray(gen_start, jnp.int32) if gen_start is not None else zero,
            jnp.asarray(gen_end, jnp.int32) if gen_end is not None else zero,
        ]
    )

    out = pl.pallas_call(
        functools.partial(_decode_kernel, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, hkv),
            in_specs=[
                pl.BlockSpec((1, 1, g, d), lambda bi, ki, *_: (bi, ki, 0, 0)),
                pl.BlockSpec((1, 1, s_len, d), lambda bi, ki, *_: (bi, ki, 0, 0)),
                pl.BlockSpec((1, 1, s_len, d), lambda bi, ki, *_: (bi, ki, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, g, d), lambda bi, ki, *_: (bi, ki, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, d), q.dtype),
        interpret=_interpret(),
    )(valid, win, qg, kt, vt)

    return out.reshape(b, 1, h, d)
