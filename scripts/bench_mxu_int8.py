"""Is s8 x s8 on the v5e MXU actually 2x bf16 at prefill shapes?

Prefill is the serving engine's dominant device phase (62% of device time,
REPORT.md round-4 host-pipeline section) and is COMPUTE-bound (81% MXU on
bf16-fed decoder GEMMs, trace_prefill_*.json) — so the one remaining lever
is the MXU's native int8 rate: 394.7 TOPS s8xs8 vs 197 TFLOP/s bf16 on v5e.
The weight-only int8 path feeds the MXU bf16 (dequantized weights), so it
runs at the bf16 rate; reaching the s8 rate needs BOTH operands int8, i.e.
dynamic per-row activation quantization.

This microbench answers the gating question before any path is built (the
measure-first rule — int4 and several "obvious" kernels banked negative):
for the three decoder GEMMs at prefill M (272 = one 224-res request; 2048 ~
a serving join wave), time

  bf16:    x_bf16 @ w_bf16                      (parity path, MXU bf16 rate)
  wq8:     x_bf16 @ dequant(w_int8)             (current int8 prefill)
  s8s8:    quant(x) @ w_int8 -> int32 -> scale  (proposed, MXU int8 rate?)
  s8_raw:  x_int8 @ w_int8 -> int32             (pure MXU ceiling, no quant
                                                 overhead in the loop)

Prints one JSON dict {arm/shape: ms} plus achieved TFLOP/s to stderr.
Reference for the protocol: ablation-style steady-state timing,
/root/reference/ablation_study_fixed.py:168-287 (phase-separated, warm-up
excluded); harness rules in scripts/_bench_util.py.
"""
from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

from _bench_util import timed_looped

# (name, K, N) for the 3B decoder GEMMs (config.py paligemma_3b_pt_224).
GEMMS = [
    ("qkv", 2048, 2560),
    ("gate_up", 2048, 32768),
    ("down", 16384, 2048),
]
MS = [272, 2048]  # single-request prefill; serving join-wave scale
LOOP_N = 16


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def arms(M: int, K: int, N: int):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.bfloat16)
    wq = jnp.round(jnp.clip(w.astype(jnp.float32) * 127 / 3, -127, 127)).astype(jnp.int8)
    ws = jnp.full((N,), 3.0 / 127, jnp.float32)
    x8 = jnp.round(jnp.clip(x.astype(jnp.float32) * 127 / 3, -127, 127)).astype(jnp.int8)

    def bf16(x, w, s):
        return jnp.dot(x, w, preferred_element_type=jnp.float32)

    def wq8(x, w, s):
        return jnp.dot(x, (w.astype(jnp.bfloat16) * s.astype(jnp.bfloat16)),
                       preferred_element_type=jnp.float32)

    def s8s8(x, w, s):
        # dynamic per-row activation quant (abs-max), int8 matmul, rescale
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True)
        scale = jnp.maximum(amax, 1e-6) / 127.0
        xq = jnp.round(x.astype(jnp.float32) / scale).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * scale * s[None, :]

    def s8_raw(x, w, s):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)

    return {
        "bf16": (bf16, x, w, ws),
        "wq8": (wq8, x, wq, ws),
        "s8s8": (s8s8, x, wq, ws),
        "s8_raw": (s8_raw, x8, wq, ws),
    }


def main() -> None:
    global GEMMS, MS, LOOP_N
    if "--cpu" in sys.argv:  # sitecustomize force-registers the TPU backend
        jax.config.update("jax_platforms", "cpu")
    if "--smoke" in sys.argv:  # correctness-of-harness only, tiny shapes
        GEMMS = [("qkv", 256, 320)]
        MS = [64]
        LOOP_N = 2
    out = {}
    for M in MS:
        for name, K, N in GEMMS:
            flops = 2 * M * K * N * LOOP_N
            for arm, (fn, x, w, s) in arms(M, K, N).items():
                # Local loop (not _bench_util.make_looped), two rules:
                # 1. the reduction must cover the FULL output — a [..., :8]
                #    slice is legally narrowable by XLA into an 8-column dot;
                # 2. BOTH operands must be loop-variant — with w invariant,
                #    XLA hoists the wq8 arm's dequant (convert+scale) out of
                #    the fori_loop and the arm times a plain bf16 matmul
                #    (caught in review: compiled HLO had zero s8 converts).
                def vary(t, i):
                    if t.dtype == jnp.int8:
                        return t + (i & 1).astype(jnp.int8)
                    return t * (1.0 + 1e-9 * i.astype(t.dtype))

                @jax.jit
                def looped(x=x, w=w, fn=fn, s=s):
                    def body(i, acc):
                        y = fn(vary(x, i), vary(w, i), s)
                        return acc + jnp.sum(y.astype(jnp.float32))

                    return jax.lax.fori_loop(0, LOOP_N, body, jnp.float32(0.0))

                prog = looped
                try:
                    ms = timed_looped(prog, LOOP_N)
                except Exception as e:  # compile/backend failure = data too
                    log(f"M{M} {name}/{arm}: FAILED {e!r}")
                    out[f"M{M} {name}/{arm}"] = None
                    continue
                tflops = flops / (ms * LOOP_N * 1e9)
                out[f"M{M} {name}/{arm}"] = round(ms, 4)
                log(f"M{M} {name}/{arm}: {ms:.4f} ms  {tflops:.1f} T(FL)OP/s")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
