"""Empirical HBM occupancy probe for the tunneled TPU backend.

The backend exposes no ``memory_stats()`` (utils/memory.py), so round 1-2
reported analytic lower bounds for the ablation's memory columns. This turns
them into measurements (round-2 VERDICT next-#7): free HBM is measured by
allocating fixed-size 256 MB blocks until the allocator refuses (ONE
compiled shape — a fresh shape per trial would cost minutes of remote
compile each), and in-use memory is the drop in free space across a state
transition:

    in_use(state) = free(baseline) - free(state)

Probes, in order (each after the previous state is freed where applicable):
  baseline            empty process
  params_bf16         3B bf16 params resident
  params_int8         int8 (llm_only) quantized params (bf16 freed)
  decode_live_int8    params + KV cache (the ablation's serving geometry)
                      + one decode chunk's workspace high-water mark

The reference measures torch.cuda.max_memory_allocated
(ablation_study_fixed.py:77-84,202); this is the equivalent evidence
obtainable through PJRT-without-stats. Fragmentation makes each number a
lower bound on true free space, so in-use values carry a +-block_mb error
bar. Writes hbm_probe.json.
"""
from __future__ import annotations

import argparse
import gc
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from paligemma_tpu import generation  # noqa: E402
from paligemma_tpu.config import paligemma_3b_pt_224, tiny_config  # noqa: E402
from paligemma_tpu.models import paligemma  # noqa: E402
from paligemma_tpu.quantization import quantize_params  # noqa: E402
from paligemma_tpu.utils.profiling import fence  # noqa: E402

BLOCK_MB = 256


def log(m):
    print(m, file=sys.stderr, flush=True)


_alloc = jax.jit(lambda: jnp.zeros((BLOCK_MB, 1024, 1024), jnp.int8) + 1)


def free_hbm_mb(max_blocks: int = 128) -> int:
    """Largest number of BLOCK_MB blocks allocatable right now."""
    gc.collect()
    blocks = []
    try:
        for _ in range(max_blocks):
            x = _alloc()
            fence(x)  # materialize: enqueue-ack is not allocation proof here
            blocks.append(x)
    except Exception as e:  # XlaRuntimeError: out of memory
        log(f"  allocator refused at block {len(blocks) + 1}: "
            f"{type(e).__name__}")
    n = len(blocks)
    for b in blocks:
        b.delete()  # synchronous device-buffer free (del alone is lazy here)
    del blocks
    gc.collect()
    _settle(n)
    return n * BLOCK_MB


def _settle(expect_blocks: int, tries: int = 30) -> None:
    """Wait until the allocator actually reflects the frees: over the
    tunneled backend, deallocations can land asynchronously, and the next
    big allocation (e.g. param init) would RESOURCE_EXHAUSTED spuriously."""
    if expect_blocks == 0:
        return
    for _ in range(tries):
        try:
            x = _alloc()
            fence(x)
            x.delete()
            return
        except Exception:
            time.sleep(1.0)
    log("  warning: allocator did not settle after frees")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="hbm_probe.json")
    ap.add_argument("--seq", type=int, default=512 + 288,
                    help="KV cache length for the decode-live probe "
                         "(ablation geometry: 512 new + 288 prompt)")
    args = ap.parse_args()

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    cfg = paligemma_3b_pt_224() if on_tpu else tiny_config()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    results = {"block_mb": BLOCK_MB, "platform": jax.devices()[0].platform}

    t0 = time.time()
    base = free_hbm_mb()
    results["free_baseline_mb"] = base
    log(f"baseline free: {base} MB ({time.time()-t0:.0f}s)")

    def retry(fn, tries=5):
        for i in range(tries):
            try:
                return fn()
            except Exception as e:
                if i == tries - 1:
                    raise
                log(f"  retrying after {type(e).__name__} "
                    "(frees still settling)")
                time.sleep(5.0)

    params = retry(
        lambda: paligemma.init_params(cfg, jax.random.PRNGKey(0), dtype))
    jax.block_until_ready(params)
    fence(jax.tree.leaves(params)[0])
    f = free_hbm_mb()
    results["free_params_bf16_mb"] = f
    results["in_use_params_bf16_mb"] = base - f
    log(f"params bf16: in use {base - f} MB")

    qparams = retry(lambda: quantize_params(params, llm_only=True))
    jax.block_until_ready(qparams)
    del params
    gc.collect()
    f = free_hbm_mb()
    results["free_params_int8_mb"] = f
    results["in_use_params_int8_mb"] = base - f
    log(f"params int8: in use {base - f} MB")

    # Decode-live set: params + cache + one chunk's workspace. Run the chunk
    # first so any persistent workspace/donation shadow is resident.
    n_img = cfg.vision_config.num_image_tokens
    ids = jnp.concatenate(
        [jnp.full((1, n_img), cfg.image_token_index, jnp.int32),
         jnp.full((1, 16), 7, jnp.int32)], axis=1)
    size = cfg.vision_config.image_size
    pix = jax.random.normal(jax.random.PRNGKey(2), (1, 3, size, size), dtype)
    cache = generation.make_cache(
        cfg, 1, ids.shape[1], max(args.seq - ids.shape[1], 64), dtype)
    params = qparams
    logits, cache = retry(
        lambda: generation._prefill_jit(params, cfg, ids, pix, cache))
    tok = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)[:, None]
    _, tok, cache = generation.decode_steps(
        params, cfg, tok, cache, jax.random.PRNGKey(0), 16)
    _ = int(tok[0, 0])
    f = free_hbm_mb()
    results["free_decode_live_int8_mb"] = f
    results["in_use_decode_live_int8_mb"] = base - f
    log(f"decode live (int8, seq {args.seq}): in use {base - f} MB")

    from paligemma_tpu.utils.memory import estimate_live_mb

    results["analytic_params_int8_mb"] = round(estimate_live_mb(qparams), 1)
    with open(args.out, "w") as fjson:
        json.dump(results, fjson, indent=2)
    log(json.dumps(results))


if __name__ == "__main__":
    main()
