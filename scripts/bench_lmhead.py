"""Measured: lm_head GEMV layout on the 257k vocab (int8 + bf16).

The tied lm_head streams the whole embedding every decode step (526 MB int8,
1.05 GB bf16 — ~21% of int8 decode traffic). The lookup-friendly layout is
(V, D) with the contraction over D ("btd,vd->btv"); this times it against a
transposed (D, V) copy ("btd,dv->btv") with the in-program loop protocol
(scripts/bench_q8.py — a pipelined microbenchmark bottoms out at the
dispatch floor). If the transposed layout wins materially, serving keeps a
second transposed copy for logits (+526 MB HBM at int8).

Writes lmhead_bench.json.
"""
from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from _bench_util import make_looped as _make_looped  # noqa: E402
from _bench_util import timed_looped  # noqa: E402

V, D = 257152, 2048
LOOP_N = 32


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_looped(matmul):
    return _make_looped(matmul, LOOP_N)


def timed(fn):
    return timed_looped(fn, LOOP_N, n=3)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 1, D), jnp.bfloat16)
    results = {}

    for dtype, name in ((jnp.int8, "int8"), (jnp.bfloat16, "bf16")):
        if dtype == jnp.int8:
            w_vd = jax.random.randint(key, (V, D), -127, 128, jnp.int8)
        else:
            w_vd = jax.random.normal(key, (V, D), jnp.bfloat16)
        s = jnp.ones((1, V), jnp.float32)
        w_dv = w_vd.T.copy() if hasattr(w_vd, "copy") else jnp.transpose(w_vd)
        w_dv = jnp.asarray(w_dv)  # materialized (D, V)
        jax.block_until_ready((w_vd, w_dv))

        f_vd = make_looped(
            lambda x, w, s: jnp.einsum(
                "btd,vd->btv", x, w.astype(x.dtype),
                preferred_element_type=jnp.float32,
            ) * s.reshape(1, 1, -1)
        )
        f_dv = make_looped(
            lambda x, w, s: jnp.einsum(
                "btd,dv->btv", x, w.astype(x.dtype),
                preferred_element_type=jnp.float32,
            ) * s.reshape(1, 1, -1)
        )
        _ = f_vd(x, w_vd, s)
        ms_vd = timed(lambda: f_vd(x, w_vd, s))
        _ = f_dv(x, w_dv, s)
        ms_dv = timed(lambda: f_dv(x, w_dv, s))
        bytes_gb = V * D * (1 if dtype == jnp.int8 else 2) / 1e9
        bound = bytes_gb / 819 * 1000
        results[f"{name}/VD_ms"] = round(ms_vd, 4)
        results[f"{name}/DV_ms"] = round(ms_dv, 4)
        results[f"{name}/bound_ms"] = round(bound, 4)
        log(f"{name}: (V,D) {ms_vd:.3f} ms | (D,V) {ms_dv:.3f} ms | bound {bound:.3f}")

    with open("lmhead_bench.json", "w") as f:
        json.dump(results, f, indent=2)
    log(json.dumps(results))


if __name__ == "__main__":
    main()
