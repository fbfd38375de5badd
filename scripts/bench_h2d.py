"""Host->device upload microbench over the tunneled backend.

Motivated by the round-4 packed-pipeline regression: the engine's stacked
bf16 pixel upload (`continuous._join_group` h2d timer) ran ~10x slower than
the fp32 per-request uploads it replaced. Hypothesis: `jnp.asarray` of an
ml_dtypes-bfloat16 numpy array takes a per-element serialization path, while
fp32/uint16 arrays ride a memcpy. Times, for one payload size:

  fp32        — jnp.asarray(np.float32 array)
  bf16-np     — jnp.asarray(ml_dtypes bfloat16 numpy array)
  u16-bitcast — jnp.asarray(bf16.view(uint16)) then device-side
                .view(bfloat16) (numerically identical to bf16-np)
  int8        — jnp.asarray(np.int8 array) (bandwidth reference)

Each arm: dispatch N uploads, fence ONCE with a host fetch (CLAUDE.md: a
single fetch costs ~25 ms flat; block_until_ready returns at enqueue-ack).
Prints one JSON line with MB/s per arm.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def fence(x):
    return np.asarray(jax.device_get(x.ravel()[0]))


def time_uploads(make_dev, host_arrays, mb_each):
    # warm-up one upload (compile/route setup)
    fence(make_dev(host_arrays[0]))
    t0 = time.perf_counter()
    devs = [make_dev(h) for h in host_arrays]
    fence(devs[-1])
    dt = time.perf_counter() - t0
    total_mb = mb_each * len(host_arrays)
    return dt, total_mb / dt


def main():
    n_reps = 8
    shape = (32, 3, 224, 224)  # one join group of pixels at 224
    rng = np.random.RandomState(0)
    base = rng.rand(*shape).astype(np.float32)
    bf16 = base.astype(ml_dtypes.bfloat16)
    u16 = bf16.view(np.uint16)
    i8 = (base * 127).astype(np.int8)

    arms = {}
    mb_f32 = base.nbytes / 1e6
    mb_bf16 = bf16.nbytes / 1e6

    dt, rate = time_uploads(jnp.asarray, [base.copy() for _ in range(n_reps)], mb_f32)
    arms["fp32"] = {"s": round(dt, 3), "mb_s": round(rate, 1)}
    log(f"fp32: {dt:.3f}s {rate:.1f} MB/s")

    dt, rate = time_uploads(jnp.asarray, [bf16.copy() for _ in range(n_reps)], mb_bf16)
    arms["bf16_np"] = {"s": round(dt, 3), "mb_s": round(rate, 1)}
    log(f"bf16-np: {dt:.3f}s {rate:.1f} MB/s")

    def up_bitcast(h):
        return jnp.asarray(h).view(jnp.bfloat16)

    dt, rate = time_uploads(up_bitcast, [u16.copy() for _ in range(n_reps)], mb_bf16)
    arms["u16_bitcast"] = {"s": round(dt, 3), "mb_s": round(rate, 1)}
    log(f"u16-bitcast: {dt:.3f}s {rate:.1f} MB/s")

    dt, rate = time_uploads(jnp.asarray, [i8.copy() for _ in range(n_reps)], mb_bf16 / 2)
    arms["int8"] = {"s": round(dt, 3), "mb_s": round(rate, 1)}
    log(f"int8: {dt:.3f}s {rate:.1f} MB/s")

    # correctness: bitcast upload == direct bf16 upload
    a = jnp.asarray(bf16)
    b = jnp.asarray(u16).view(jnp.bfloat16)
    ident = bool(jnp.all(a == b))

    print(json.dumps({"device": str(jax.devices()[0]), "reps": n_reps,
                      "shape": list(shape), "arms": arms,
                      "bitcast_identical": ident}))


if __name__ == "__main__":
    main()
