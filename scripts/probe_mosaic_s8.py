"""Feasibility probe: does Mosaic (Pallas TPU) support the ops the w4a8
decode kernel needs? Run on the real chip; prints one line per capability.

Capabilities probed:
  1. s8 x s8 dot_general with preferred_element_type=int32 inside a kernel
  2. arithmetic right-shift on an int8 VMEM tile (native or via int32 widen)
  3. int32 VMEM scratch accumulation

Context: the round-3 int4 kernel (ops/pallas_quant.q4_matmul) lost to its
~7-op/byte VPU unpack chain feeding bf16 MXU operands (REPORT.md int4
section). The proposed w4a8 formulation needs ONE shift per packed byte and
8-bit MXU feeds: byte = (q_hi<<4)|(q_lo+8); dot1 = P@x, dot2 = (P>>4)@x;
hi = dot2, lo = dot1 - 16*dot2 - 8*rowsum(x) — exact in s32.
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def probe(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"{name}: OK {np.asarray(out).ravel()[:4].tolist()}")
        return True
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}")
        return False


T, D, O = 8, 256, 256


def _dot_kernel(x_ref, w_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def s8_dot():
    x = jnp.arange(T * D, dtype=jnp.int32).reshape(T, D) % 13 - 6
    w = jnp.arange(D * O, dtype=jnp.int32).reshape(D, O) % 11 - 5
    xq, wq = x.astype(jnp.int8), w.astype(jnp.int8)
    out = pl.pallas_call(
        _dot_kernel,
        out_shape=jax.ShapeDtypeStruct((T, O), jnp.int32),
    )(xq, wq)
    ref = x @ w
    assert (np.asarray(out) == np.asarray(ref)).all(), "dot mismatch"
    return out


def _shift_kernel(p_ref, o_ref):
    o_ref[:] = p_ref[...] >> 4


def s8_shift_native():
    p = (jnp.arange(8 * 256, dtype=jnp.int32).reshape(8, 256) % 251 - 125)
    p8 = p.astype(jnp.int8)
    out = pl.pallas_call(
        _shift_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int8),
    )(p8)
    ref = np.asarray(p8, dtype=np.int8) >> 4
    assert (np.asarray(out) == ref).all(), "shift mismatch"
    return out


def _shift_widen_kernel(p_ref, o_ref):
    o_ref[:] = (p_ref[...].astype(jnp.int32) >> 4).astype(jnp.int8)


def s8_shift_widen():
    p = (jnp.arange(8 * 256, dtype=jnp.int32).reshape(8, 256) % 251 - 125)
    p8 = p.astype(jnp.int8)
    out = pl.pallas_call(
        _shift_widen_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int8),
    )(p8)
    ref = np.asarray(p8, dtype=np.int8) >> 4
    assert (np.asarray(out) == ref).all(), "shift mismatch"
    return out


def _combined_kernel(x_ref, p_ref, o_ref, acc1, acc2):
    # One d-tile: both dots + s32 accumulation, like the real kernel.
    x = x_ref[...]
    p = p_ref[...]
    a = (p.astype(jnp.int32) >> 4).astype(jnp.int8)
    acc1[:] = jax.lax.dot_general(
        x, p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    acc2[:] = jax.lax.dot_general(
        x, a, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    rowsum = jnp.sum(x.astype(jnp.int32), axis=1, keepdims=True)
    lo = acc1[...] - 16 * acc2[...] - 8 * rowsum
    hi = acc2[...]
    o_ref[:, : p.shape[1]] = lo
    o_ref[:, p.shape[1]:] = hi


def w4a8_combined():
    rng = np.random.default_rng(0)
    q = rng.integers(-7, 8, size=(D, O), dtype=np.int8)  # int4 values
    half = O // 2
    # byte = (q_hi << 4) | (q_lo + 8): lo nibble = channels [:half]
    packed = ((q[:, half:].astype(np.int32) << 4)
              | (q[:, :half].astype(np.int32) + 8)).astype(np.int8)
    x = rng.integers(-127, 128, size=(T, D), dtype=np.int8)
    out = pl.pallas_call(
        _combined_kernel,
        out_shape=jax.ShapeDtypeStruct((T, O), jnp.int32),
        scratch_shapes=[pltpu.VMEM((T, half), jnp.int32),
                        pltpu.VMEM((T, half), jnp.int32)],
    )(jnp.asarray(x), jnp.asarray(packed))
    ref_lo = x.astype(np.int32) @ q[:, :half].astype(np.int32)
    ref_hi = x.astype(np.int32) @ q[:, half:].astype(np.int32)
    got = np.asarray(out)
    assert (got[:, :half] == ref_lo).all(), "lo mismatch"
    assert (got[:, half:] == ref_hi).all(), "hi mismatch"
    return out


if __name__ == "__main__":
    log(f"devices: {jax.devices()}")
    ok = probe("s8xs8 dot -> s32", s8_dot)
    probe("s8 >>4 native", s8_shift_native)
    probe("s8 >>4 via int32 widen", s8_shift_widen)
    if ok:
        probe("w4a8 combined (exact nibble recovery)", w4a8_combined)
