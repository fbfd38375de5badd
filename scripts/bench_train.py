"""LoRA finetune train-step throughput at the flagship 3B-224 geometry.

The reference finetunes with torch/peft on consumer GPUs (SURVEY.md §2.9,
reference finetune loop: AdamW + grad-accum + clip); this framework's jitted
optax step (`lora.make_train_step`) was correctness-tested at tiny scale and
resume-tested, but its 3B-on-TPU throughput was never measured. This bench
reports steady-state samples/s and step latency for batch sizes that fit one
v5e-1 (bf16 base params ~5.4 GB + activations; LoRA grads/optimizer are
rank-8 — megabytes).

Protocol: compile + one warm-up step excluded; N steps timed behind ONE
closing fence (per-dispatch RPC ~5-7 ms, host fetch ~25 ms — CLAUDE.md);
best-of-3 windows. Each batch size runs in this same process (a
RESOURCE_EXHAUSTED on the bigger batch would wedge the context — so batch
sizes run SMALLEST FIRST and the JSON is written incrementally after each).
Prints one JSON dict; progress to stderr.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax

if "--smoke" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from paligemma_tpu.config import paligemma_3b_pt_224, tiny_config
from paligemma_tpu.lora import LoraConfig, default_optimizer, init_lora, make_train_step
from paligemma_tpu.models import paligemma

STEPS = 8
OUT = "train_bench.json"


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    smoke = "--smoke" in sys.argv
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    cfg = paligemma_3b_pt_224() if on_tpu else tiny_config()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    batches = [1, 2, 4] if on_tpu else [1, 2]
    log(f"platform={'tpu' if on_tpu else 'cpu'}")

    params = paligemma.init_params(cfg, jax.random.PRNGKey(0), dtype)
    jax.block_until_ready(params)
    log("params ready")

    lcfg = LoraConfig()  # reference defaults: r8 / alpha16 / dropout 0.1
    lora = init_lora(cfg, lcfg, jax.random.PRNGKey(1))
    opt = default_optimizer(accum_steps=1)  # per-step cost; accum is a host loop
    opt_state = opt.init(lora)
    step = make_train_step(cfg, lcfg, opt, train=True)

    n_img = cfg.vision_config.num_image_tokens
    size = cfg.vision_config.image_size
    t_text = 16
    seq = n_img + t_text
    out = {"seq_len": seq, "lora": "r8a16drop0.1(qkv)", "steps_per_window": STEPS}

    for b in batches:  # smallest first: an OOM wedges this whole process
        ids = jnp.concatenate([
            jnp.full((b, n_img), cfg.image_token_index, jnp.int32),
            jax.random.randint(jax.random.PRNGKey(2), (b, t_text), 2, 250),
        ], axis=1)
        pix = jax.random.normal(jax.random.PRNGKey(3), (b, 3, size, size), dtype)
        labels = jnp.concatenate([
            jnp.full((b, n_img), -100, jnp.int32),  # prefix masked from CE
            jax.random.randint(jax.random.PRNGKey(4), (b, t_text), 2, 250),
        ], axis=1)
        batch = {"input_ids": ids, "pixel_values": pix, "labels": labels}
        key = jax.random.PRNGKey(5)
        try:
            loss, lora_w, opt_w = step(params, lora, opt_state, batch, key)
            _ = float(loss)  # compile + warm-up fence
            best = float("inf")
            for _w in range(3):
                t0 = time.time()
                l2, lw, ow = loss, lora_w, opt_w
                for _ in range(STEPS):
                    l2, lw, ow = step(params, lw, ow, batch, key)
                _ = float(l2)  # one fence per window
                best = min(best, (time.time() - t0) / STEPS)
            out[f"b{b}_step_ms"] = round(best * 1000, 2)
            out[f"b{b}_samples_s"] = round(b / best, 3)
            log(f"b={b}: {best * 1000:.1f} ms/step = {b / best:.2f} samples/s "
                f"(loss {float(l2):.3f})")
        except Exception as e:
            log(f"b={b} FAILED: {e!r}")
            out[f"b{b}_error"] = repr(e)[:200]
            break  # context may be wedged (RESOURCE_EXHAUSTED) — stop here
        with open(OUT if not smoke else "/tmp/train_bench_smoke.json", "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
