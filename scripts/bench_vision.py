"""Measured: vision-tower (SigLIP So400m) forward time on TPU, pipelined.

Times the 27-layer ViT at batch 1 (the prefill cost center: REPORT.md puts
it at 5.5 ms of the 13.7 ms true prefill) by pipelining N dispatches against
ONE closing fence — the only honest protocol over the tunneled backend
(a single host fetch costs ~25 ms, CLAUDE.md). Also times the full prefill
for the before/after of kernel changes (e.g. the fused vision qkv).

Writes vision_bench.json.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from paligemma_tpu import generation  # noqa: E402
from paligemma_tpu.config import paligemma_3b_pt_224, tiny_config  # noqa: E402
from paligemma_tpu.models import paligemma, siglip  # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


PIPELINE_N = 16
REPEATS = 3


def timed_pipeline(fn, repeats=REPEATS, n=PIPELINE_N):
    """Best-of-repeats ms per call: n dispatches, one closing fence.

    Drains by hard-fetching one fresh fn() output before each window —
    block_until_ready returns at enqueue-ack on this backend (CLAUDE.md), so
    fetching a stale array would NOT wait out in-flight warm-up work."""

    def fetch(out):
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.sum(leaf[..., :1]))  # tiny host fetch = hard fence

    best = float("inf")
    for _ in range(repeats):
        fetch(fn())  # true drain: everything enqueued before this is done
        t0 = time.time()
        out = None
        for _ in range(n):
            out = fn()
        fetch(out)
        best = min(best, (time.time() - t0) * 1000 / n)
    return best


def main():
    import argparse

    from paligemma_tpu.config import paligemma_3b_pt_448, paligemma_3b_pt_896

    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, choices=[224, 448, 896], default=224)
    ap.add_argument("--pallas", action="store_true",
                    help="use the Pallas flash-attention kernel in the tower "
                         "(at 4096 patches the fp32 score materialization is "
                         "~1 GB/layer — the shape where flash should win)")
    args = ap.parse_args()
    if args.pallas:
        from paligemma_tpu import runtime

        runtime.use_pallas_attention = True
    mk = {224: paligemma_3b_pt_224, 448: paligemma_3b_pt_448,
          896: paligemma_3b_pt_896}[args.res]
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    cfg = mk() if on_tpu else tiny_config()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    params = paligemma.init_params(cfg, jax.random.PRNGKey(0), dtype)
    jax.block_until_ready(params)
    log("params ready")

    size = cfg.vision_config.image_size
    pix = jax.random.normal(jax.random.PRNGKey(2), (1, 3, size, size), dtype)

    vis_fn = jax.jit(
        lambda p, x: siglip.apply(p, cfg.vision_config, x)
    )
    jax.block_until_ready(vis_fn(params["vision"], pix))  # compile

    vis_ms = timed_pipeline(lambda: vis_fn(params["vision"], pix))
    log(f"vision tower: {vis_ms:.2f} ms")

    # full prefill for context
    n_img = cfg.vision_config.num_image_tokens
    ids = jnp.concatenate(
        [
            jnp.full((1, n_img), cfg.image_token_index, jnp.int32),
            jnp.full((1, 16), 7, jnp.int32),
        ],
        axis=1,
    )
    cache = generation.make_cache(cfg, 1, ids.shape[1], 16, dtype)
    logits, _ = generation._prefill_jit(params, cfg, ids, pix, cache)
    jax.block_until_ready(logits)

    def pf():
        out, _ = generation._prefill_jit(params, cfg, ids, pix, cache)
        return out

    pf_ms = timed_pipeline(pf)
    log(f"full prefill: {pf_ms:.2f} ms")

    from paligemma_tpu import runtime as rt

    n_patches = cfg.vision_config.num_image_tokens
    attention = (
        "flash-flag" if args.pallas
        else ("flash-auto" if rt.auto_flash_min_seq
              and n_patches >= rt.auto_flash_min_seq else "xla")
    )
    result = {"res": args.res, "pallas": bool(args.pallas),
              "attention": attention,
              "vision_ms": round(vis_ms, 2), "prefill_ms": round(pf_ms, 2)}
    name = "vision_bench" + ("" if args.res == 224 else f"_{args.res}")
    name += ("_pallas" if args.pallas else "") + ".json"
    with open(name, "w") as f:
        json.dump(result, f, indent=2)
    log(json.dumps(result))


if __name__ == "__main__":
    main()
