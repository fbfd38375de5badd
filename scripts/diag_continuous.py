"""Diagnostic: per-step wall breakdown of the continuous engine on TPU.

Times each engine step's phases (dispatch, fill, fetch) by monkey-wrapping,
to locate where join overlap helps or hurts. Not part of the test suite.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from paligemma_tpu.config import paligemma_3b_pt_224, tiny_config  # noqa: E402
from paligemma_tpu import continuous as C  # noqa: E402
from paligemma_tpu.models import paligemma  # noqa: E402
from paligemma_tpu.processing import (  # noqa: E402
    ByteTokenizer, PaliGemmaProcessor, align_config,
)


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    cfg = paligemma_3b_pt_224() if on_tpu else tiny_config()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    tok = ByteTokenizer()
    proc = PaliGemmaProcessor(
        tok, cfg.vision_config.num_image_tokens, cfg.vision_config.image_size
    )
    cfg = align_config(cfg, proc)
    params = paligemma.init_params(cfg, jax.random.PRNGKey(0), dtype)
    jax.block_until_ready(params)
    log("params ready")

    from PIL import Image

    rng = np.random.RandomState(0)
    n_req = 32
    budgets = [int(b) for b in rng.choice([16, 32, 48, 64, 96, 128], n_req)]
    prompts = [f"describe financial document {i}" for i in range(n_req)]
    images = [
        Image.fromarray(rng.randint(0, 255, (224, 224, 3), np.uint8))
        for _ in range(n_req)
    ]
    n_img = cfg.vision_config.num_image_tokens
    budget_prompt = n_img + 48

    def run(label):
        eng = C.ContinuousBatcher(
            params, cfg, proc, n_slots=8, prompt_budget=budget_prompt,
            max_new_tokens=128, chunk=16, cache_dtype=dtype,
        )
        # wrap phases
        orig_fill = eng._fill_slots
        orig_decode = C.slot_decode_steps
        stats = {"fill": 0.0, "decode_dispatch": 0.0, "fetch": 0.0,
                 "joins": 0, "steps": 0}

        def fill():
            t0 = time.time()
            n_before = sum(r is not None for r in eng.slot_req)
            orig_fill()
            if sum(r is not None for r in eng.slot_req) > n_before:
                stats["joins"] += 1
            stats["fill"] += time.time() - t0

        eng._fill_slots = fill

        # break down _join_group internals (kept in lockstep with
        # continuous._join_group — sampling now lives INSIDE the insert)
        jg_stats = {"pad": 0.0, "asarray": 0.0, "prefill": 0.0,
                    "insert": 0.0, "cache": 0.0}

        def join_group(joiners):
            from paligemma_tpu import serving as S
            from paligemma_tpu.continuous import _insert_group as INS
            from paligemma_tpu.models import gemma as G

            g = len(joiners)
            g_b = 1 if g == 1 else eng.n_slots
            reqs = [r for _, r in joiners]
            t0 = time.time()
            ids, valid, pix, _ = S.pad_batch(
                eng.processor, [r.prompt for r in reqs], [r.image for r in reqs],
                prompt_bucket=eng.prompt_budget, batch_bucket=g_b,
            )
            jg_stats["pad"] += time.time() - t0
            t0 = time.time()
            ids_d = jnp.asarray(ids)
            pix_d = jnp.asarray(pix, eng.cache_dtype)
            valid_d = jnp.asarray(valid)
            jg_stats["asarray"] += time.time() - t0
            t0 = time.time()
            temp = G.init_cache(eng.cfg.text_config, g_b, eng.prompt_budget, eng.cache_dtype)
            jg_stats["cache"] += time.time() - t0
            t0 = time.time()
            logits, temp = S.batched_prefill(eng.params, eng.cfg, ids_d, pix_d, valid_d, temp)
            jg_stats["prefill"] += time.time() - t0
            t0 = time.time()
            req_temps = np.zeros((g_b,), np.float32)
            req_topps = np.full((g_b,), 0.9, np.float32)
            for i, (_, req) in enumerate(joiners):
                req_temps[i] = req.temperature
                req_topps[i] = req.top_p
            eng.key, sub = jax.random.split(eng.key)
            slots = np.full((g_b,), eng.trash_row, np.int32)
            for i, (slot, req) in enumerate(joiners):
                slots[i] = slot
                eng.slot_req[slot] = req
            (eng.cache, eng.lengths, eng.cur_tok, eng.temps, eng.topps,
             first, _) = INS(
                eng.cache, temp, jnp.asarray(slots), eng.lengths, eng.cur_tok,
                eng.temps, eng.topps, jnp.asarray(valid),
                logits, sub, jnp.asarray(req_temps), jnp.asarray(req_topps),
            )
            jg_stats["insert"] += time.time() - t0
            eng._pending_first.append((joiners, first))

        eng._join_group = join_group

        def decode(*a, **k):
            t0 = time.time()
            out = orig_decode(*a, **k)
            stats["decode_dispatch"] += time.time() - t0
            return out

        C.slot_decode_steps = decode

        for p, im, b in zip(prompts, images, budgets):
            eng.submit(p, im, max_new_tokens=b)
        t0 = time.time()
        step_times = []
        while True:
            ts = time.time()
            alive = eng.step()
            step_times.append(time.time() - ts)
            stats["steps"] += 1
            if not alive:
                break
        wall = time.time() - t0
        C.slot_decode_steps = orig_decode
        errs = [r for r in eng.completed if r.error is not None]
        toks = sum(len(r.tokens) for r in eng.completed)
        assert not errs, f"{len(errs)} requests errored: {errs[0].error!r}"
        assert toks > 0, "no tokens decoded — instrumentation out of sync?"
        log(f"{label}: wall {wall:.2f}s steps {stats['steps']} joins {stats['joins']}")
        log(f"  fill(host) {stats['fill']:.2f}s dispatch {stats['decode_dispatch']:.2f}s")
        st = sorted(step_times)
        log(f"  step p50 {st[len(st)//2]*1000:.0f}ms p90 {st[int(len(st)*0.9)]*1000:.0f}ms max {st[-1]*1000:.0f}ms")
        log("  join breakdown: " + " ".join(f"{k} {v:.2f}s" for k, v in jg_stats.items()))
        return wall

    run("compile")
    run("measured")


if __name__ == "__main__":
    main()
