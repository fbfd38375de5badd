"""Pallas fused RMSNorm kernel.

Gemma RMSNorm semantics preserved exactly: fp32 statistics, ``(1 + w)`` scale
with a zero-initialized weight, cast back to the activation dtype
(reference: modeling_gemma.py:107-120). The kernel fuses the square-mean
reduction, rsqrt, and scale into one VMEM pass — on the XLA path these fuse
too, but a standalone kernel keeps the decode hot loop's elementwise traffic
explicit and is the building block for deeper fusions (norm+matmul).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.devices()[0].platform == "cpu"


def _rms_kernel(x_ref, w_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)  # (bt, D)
    w = w_ref[...].astype(jnp.float32)  # (1, D)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    normed = x * jax.lax.rsqrt(var + eps)
    o_ref[...] = (normed * (1.0 + w)).astype(o_ref.dtype)


def rms_norm_pallas(
    x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6, block_t: int = 256
) -> jnp.ndarray:
    """Fused RMSNorm. x: (..., D); weight: (D,)."""
    orig_shape = x.shape
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    t = x2.shape[0]
    bt = min(block_t, max(8, t))
    t_pad = -(-t // bt) * bt
    x2 = jnp.pad(x2, ((0, t_pad - t), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_rms_kernel, eps=eps),
        grid=(t_pad // bt,),
        in_specs=[
            pl.BlockSpec((bt, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, d), x.dtype),
        interpret=_interpret(),
    )(x2, weight.reshape(1, d))

    return out[:t].reshape(orig_shape)
