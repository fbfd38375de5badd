"""Empirical HBM occupancy probe for the tunneled TPU backend.

The backend exposes no ``memory_stats()`` (utils/memory.py), so rounds 1-2
reported analytic lower bounds for the ablation's memory columns. This
turns them into measurements: free HBM is probed by allocating fixed-size
256 MB blocks until the allocator refuses (ONE compiled shape — a fresh
shape per trial would cost minutes of remote compile each), and in-use
memory is the drop in free space across a state transition:

    in_use(state) = free(baseline) - free(state)

Backend constraint discovered on the first run: an allocation failure
WEDGES the device context for the rest of the process (every later
allocation also fails), so each phase runs in its OWN subprocess and hits
OOM exactly once, as its final act:

  baseline          empty process
  params_bf16       3B bf16 params resident
  params_int8       int8 (llm_only) params resident (bf16 freed)
  decode_live_int8  int8 params + KV cache (serving geometry) + one decode
                    chunk's workspace high-water mark

The reference measures torch.cuda.max_memory_allocated
(ablation_study_fixed.py:77-84,202); this is the equivalent evidence
obtainable through PJRT-without-stats. Fragmentation makes each number a
lower bound on free space, so in-use values carry a +-block_mb error bar.

Usage: python scripts/probe_hbm.py            # orchestrates all phases
       python scripts/probe_hbm.py --phase X  # one phase (internal)
Writes hbm_probe.json.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BLOCK_MB = 256
PHASES = ["baseline", "params_bf16", "params_int8", "decode_live_int8"]


def log(m):
    print(m, file=sys.stderr, flush=True)


def free_hbm_mb(max_blocks: int = 128) -> int:
    """Blocks allocatable until refusal. Terminal: the OOM wedges the
    device context, so call this once, last."""
    import gc

    import jax
    import jax.numpy as jnp

    from paligemma_tpu.utils.profiling import fence

    _alloc = jax.jit(lambda: jnp.zeros((BLOCK_MB, 1024, 1024), jnp.int8) + 1)
    gc.collect()
    blocks = []
    try:
        for _ in range(max_blocks):
            x = _alloc()
            fence(x)  # materialize: enqueue-ack is not allocation proof here
            blocks.append(x)
    except Exception as e:
        log(f"  allocator refused at block {len(blocks) + 1}: "
            f"{type(e).__name__}")
    return len(blocks) * BLOCK_MB


def run_phase(phase: str, seq: int) -> dict:
    import jax
    import jax.numpy as jnp

    from paligemma_tpu import generation
    from paligemma_tpu.config import paligemma_3b_pt_224, tiny_config
    from paligemma_tpu.models import paligemma
    from paligemma_tpu.quantization import quantize_params
    from paligemma_tpu.utils.profiling import fence

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    cfg = paligemma_3b_pt_224() if on_tpu else tiny_config()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    params = None
    if phase != "baseline":
        params = paligemma.init_params(cfg, jax.random.PRNGKey(0), dtype)
        jax.block_until_ready(params)
        fence(jax.tree.leaves(params)[0])
    if phase in ("params_int8", "decode_live_int8"):
        import gc

        qparams = quantize_params(params, llm_only=True)
        jax.block_until_ready(qparams)
        del params
        gc.collect()
        params = qparams
        fence(jax.tree.leaves(params)[0])
    if phase == "decode_live_int8":
        n_img = cfg.vision_config.num_image_tokens
        ids = jnp.concatenate(
            [jnp.full((1, n_img), cfg.image_token_index, jnp.int32),
             jnp.full((1, 16), 7, jnp.int32)], axis=1)
        size = cfg.vision_config.image_size
        pix = jax.random.normal(
            jax.random.PRNGKey(2), (1, 3, size, size), dtype)
        cache = generation.make_cache(
            cfg, 1, ids.shape[1], max(seq - ids.shape[1], 64), dtype)
        logits, cache = generation._prefill_jit(params, cfg, ids, pix, cache)
        tok = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)[:, None]
        _, tok, cache = generation.decode_steps(
            params, cfg, tok, cache, jax.random.PRNGKey(0), 16)
        _ = int(tok[0, 0])
    free = free_hbm_mb()
    return {"phase": phase, "free_mb": free}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=PHASES, default=None)
    ap.add_argument("--out", default="hbm_probe.json")
    ap.add_argument("--seq", type=int, default=512 + 288,
                    help="KV cache length for the decode-live probe "
                         "(ablation geometry: 512 new + 288 prompt)")
    args = ap.parse_args()

    if args.phase:
        print(json.dumps(run_phase(args.phase, args.seq)))
        return

    results = {"block_mb": BLOCK_MB, "seq": args.seq}
    for phase in PHASES:
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--phase", phase, "--seq", str(args.seq)],
            capture_output=True, text=True, timeout=1200,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        try:
            results[f"free_{phase}_mb"] = json.loads(line)["free_mb"]
        except Exception:
            log(f"phase {phase} failed: {proc.stderr[-800:]}")
            results[f"free_{phase}_mb"] = None
        log(f"{phase}: free {results[f'free_{phase}_mb']} MB "
            f"({time.time()-t0:.0f}s)")
    base = results.get("free_baseline_mb")
    if base:
        for phase in PHASES[1:]:
            f = results.get(f"free_{phase}_mb")
            results[f"in_use_{phase}_mb"] = base - f if f is not None else None
    try:
        from paligemma_tpu.utils.memory import estimate_live_mb  # noqa: F401

        results["note"] = ("in_use = free(baseline) - free(state); "
                           f"granularity +-{BLOCK_MB} MB")
    except Exception:
        pass
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    log(json.dumps(results))


if __name__ == "__main__":
    main()
