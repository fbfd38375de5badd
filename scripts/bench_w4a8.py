"""Kernel-level w4a8 bench: which unpack variant reaches the packed-bytes
floor on the decode weight streams?

The model-level w4a8 arm (scripts/bench_int4.py) landed at 3.90 ms/token —
better than round-3 int4's 4.47 but only at int8 parity (~3.8), far from the
~1.9 ms packed-bytes floor. Hypothesis: the widen/mask/trunc unpack (3 VPU
passes over the packed bytes) dominates. This times q4a8_matmul's unpack
variants (and32 / and8 / bitcast / noop-ablation) against the int8 kernel
and the streamed-bytes bounds, with the in-program loop protocol
(_bench_util). Writes w4a8_kernel_bench.json.
"""
from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from _bench_util import make_looped, timed_looped  # noqa: E402
from paligemma_tpu.ops.pallas_quant import (  # noqa: E402
    pack_int4_mxu,
    pack_int4_mxu_tiled,
    q4a8_matmul,
    q4a8_matmul_tiled,
    q8_matmul,
)

LOOP_N = 64


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    shapes = {
        "qkv (2048x2560)": (2048, 2560),
        "gate_up (2048x32768)": (2048, 32768),
        "down (16384x2048)": (16384, 2048),
    }
    results = {}
    for name, (d, o) in shapes.items():
        q4 = rng.integers(-7, 8, size=(d, o), dtype=np.int8)
        scale = (rng.random((1, o), dtype=np.float32) + 0.5) * 0.01
        packed = jnp.asarray(pack_int4_mxu(jnp.asarray(q4)))
        tiled = jnp.asarray(pack_int4_mxu_tiled(jnp.asarray(q4)))
        q8 = jnp.asarray(q4)  # int8 stand-in with the same value range
        s = jnp.asarray(scale)
        x = jnp.asarray(rng.standard_normal((1, 1, d)), dtype)
        jax.block_until_ready((packed, tiled, q8, x))

        arms = {"int8": lambda x, w, s: q8_matmul(x, w, s)}
        for mode in ("and32", "and8", "bitcast", "noop"):
            arms[f"w4a8_{mode}"] = (
                lambda x, w, s, m=mode: q4a8_matmul(x, w, s, 0, m)
            )
        # Pack-time-tiled weight layout: contiguous per-program DMA tiles.
        # Measured ~= flat within wobble (w4a8_kernel_bench.json — Mosaic's
        # prefetch covers the flat layout's strided bursts); kept because
        # the fused-MLP kernels require per-program-contiguous tiles.
        for mode in ("and32", "bitcast", "noop"):
            arms[f"w4a8_tiled_{mode}"] = (
                lambda x, w, s, m=mode: q4a8_matmul_tiled(x, w, s, m)
            )

        for arm, fn in arms.items():
            w = q8 if arm == "int8" else tiled if "tiled" in arm else packed
            try:
                lf = make_looped(fn, LOOP_N)
                _ = lf(x, w, s)
                ms = timed_looped(lambda: lf(x, w, s), LOOP_N)
                results[f"{name}/{arm}"] = round(ms, 4)
                log(f"{name}: {arm} {ms:.4f} ms")
            except Exception as e:  # noqa: BLE001
                results[f"{name}/{arm}"] = f"FAIL {type(e).__name__}"
                log(f"{name}: {arm} FAILED {str(e)[:200]}")

        results[f"{name}/bound_int8_819GBs"] = round(d * o / 1e9 / 819 * 1e3, 4)
        results[f"{name}/bound_w4_819GBs"] = round(d * o / 2 / 1e9 / 819 * 1e3, 4)

    mlp_arms(results, rng, dtype)

    with open("w4a8_kernel_bench.json", "w") as f:
        json.dump(results, f, indent=2)
    log(json.dumps(results))


def mlp_arms(results, rng, dtype):
    """Whole-MLP arms at the 3B geometry (ADVICE r4: bench_w4a8 never timed
    mlp_w4a8). The key A/B is fused_sliced_dyn vs fused_stacked: the former
    feeds the Pallas call a dynamic layer slice of the stacked weights (what
    the decoder scan used to do — XLA materializes the slice as an HBM copy
    in front of a custom call), the latter indexes the stack in-kernel via
    scalar prefetch (the round-5 fix). Their delta is the copy cost."""
    import functools

    import time as _time

    from paligemma_tpu.ops.pallas_quant import (
        Q4A8TiledTensor, mlp_w4a8, mlp_w4a8_stacked, regroup_scales_stacked,
    )

    d, inter, L = 2048, 16384, 4
    qg = rng.integers(-7, 8, size=(L, d, 2 * inter), dtype=np.int8)
    sg = ((rng.random((L, 1, 2 * inter), dtype=np.float32)) + 0.5) * 0.01
    qd = rng.integers(-7, 8, size=(L, inter, d), dtype=np.int8)
    sd = ((rng.random((L, 1, d), dtype=np.float32)) + 0.5) * 0.01
    gu_packed = jnp.asarray(pack_int4_mxu_tiled(jnp.asarray(qg)))
    dn_packed = jnp.asarray(pack_int4_mxu_tiled(jnp.asarray(qd)))
    gu_scale, dn_scale = jnp.asarray(sg), jnp.asarray(sd)
    nb_gu, half_gu = gu_packed.shape[1], gu_packed.shape[4]
    nb_od, half_dn = dn_packed.shape[1], dn_packed.shape[4]
    gu_s2 = regroup_scales_stacked(gu_scale, nb_gu, half_gu)
    dn_s2 = regroup_scales_stacked(dn_scale, nb_od, half_dn)
    x = jnp.asarray(rng.standard_normal((1, 1, d)), dtype)
    jax.block_until_ready((gu_packed, dn_packed, x))

    def unfused(xi, li):
        gp = jax.lax.dynamic_index_in_dim(gu_packed, li, keepdims=False)
        gs = jax.lax.dynamic_index_in_dim(gu_scale, li, keepdims=False)
        dp = jax.lax.dynamic_index_in_dim(dn_packed, li, keepdims=False)
        ds_ = jax.lax.dynamic_index_in_dim(dn_scale, li, keepdims=False)
        h = q4a8_matmul_tiled(xi, gp, gs)
        act = jax.nn.gelu(
            h[..., :inter].astype(jnp.float32), approximate=True
        ).astype(xi.dtype)
        return q4a8_matmul_tiled(act * h[..., inter:], dp, ds_)

    def fused_sliced_dyn(xi, li):
        gp = jax.lax.dynamic_index_in_dim(gu_packed, li, keepdims=False)
        gs = jax.lax.dynamic_index_in_dim(gu_scale, li, keepdims=False)
        dp = jax.lax.dynamic_index_in_dim(dn_packed, li, keepdims=False)
        ds_ = jax.lax.dynamic_index_in_dim(dn_scale, li, keepdims=False)
        return mlp_w4a8(
            xi, Q4A8TiledTensor(gp, gs), Q4A8TiledTensor(dp, ds_), inter
        )

    def fused_stacked(xi, li):
        return mlp_w4a8_stacked(
            xi, gu_packed, gu_s2, dn_packed, dn_s2, li, inter
        )

    # Blocking / unpack variants of the production kernel. trace_decode_w4a8
    # put the shipped config at 84 us/layer = 597 GB/s (vs ~750 achievable);
    # candidates: halve the grid-step count with block_o=1024 (1 MB DMA
    # blocks), or cheapen the in-kernel hi-nibble mask (bitcast/noop — noop
    # is a wrong-math ablation that bounds the mask's cost).
    gu_packed_b1k = jnp.asarray(
        pack_int4_mxu_tiled(jnp.asarray(qg), block_o=1024))
    dn_packed_b1k = jnp.asarray(
        pack_int4_mxu_tiled(jnp.asarray(qd), block_o=1024))
    gu_s2_b1k = regroup_scales_stacked(
        gu_scale, gu_packed_b1k.shape[1], gu_packed_b1k.shape[4])
    dn_s2_b1k = regroup_scales_stacked(
        dn_scale, dn_packed_b1k.shape[1], dn_packed_b1k.shape[4])

    def fused_stacked_bo1024(xi, li):
        return mlp_w4a8_stacked(
            xi, gu_packed_b1k, gu_s2_b1k, dn_packed_b1k, dn_s2_b1k, li, inter
        )

    def fused_stacked_bitcast(xi, li):
        return mlp_w4a8_stacked(
            xi, gu_packed, gu_s2, dn_packed, dn_s2, li, inter, "bitcast"
        )

    def fused_stacked_noop(xi, li):
        return mlp_w4a8_stacked(
            xi, gu_packed, gu_s2, dn_packed, dn_s2, li, inter, "noop"
        )

    def fused_stacked_bo1024_bitcast(xi, li):
        return mlp_w4a8_stacked(
            xi, gu_packed_b1k, gu_s2_b1k, dn_packed_b1k, dn_s2_b1k, li,
            inter, "bitcast"
        )

    arms = {
        "unfused_tiled_dyn": unfused,
        "fused_sliced_dyn": fused_sliced_dyn,
        "fused_stacked": fused_stacked,
        "fused_stacked_bo1024": fused_stacked_bo1024,
        "fused_stacked_bitcast": fused_stacked_bitcast,
        "fused_stacked_noop": fused_stacked_noop,
        "fused_stacked_bo1024_bitcast": fused_stacked_bo1024_bitcast,
    }
    loop_n = 32
    for arm, fn in arms.items():
        try:
            @jax.jit
            def looped(xx, fn=fn):
                def body(i, acc):
                    xi = xx * (1.0 + 1e-9 * i.astype(xx.dtype))
                    y = fn(xi, i % L)
                    return acc + jnp.sum(y[..., :8].astype(jnp.float32))

                return jax.lax.fori_loop(0, loop_n, body, jnp.float32(0.0))

            float(looped(x))  # compile + fence
            best = float("inf")
            for _ in range(3):
                float(looped(x))
                t0 = _time.time()
                out = None
                for _ in range(4):
                    out = looped(x)
                float(out)
                best = min(best, (_time.time() - t0) * 1000 / (4 * loop_n))
            results[f"mlp (2048x16384)/{arm}"] = round(best, 4)
            log(f"mlp: {arm} {best:.4f} ms")
        except Exception as e:  # noqa: BLE001
            results[f"mlp (2048x16384)/{arm}"] = f"FAIL {type(e).__name__}"
            log(f"mlp: {arm} FAILED {str(e)[:300]}")
    per_layer_bytes = (d * 2 * inter + inter * d) / 2
    results["mlp (2048x16384)/bound_w4_819GBs"] = round(
        per_layer_bytes / 1e9 / 819 * 1e3, 4
    )


if __name__ == "__main__":
    main()
