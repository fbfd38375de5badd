"""KV-cache on/off ablation study — TPU port of the reference harness
(reference: ablation_study_fixed.py), preserving its protocol and output
schemas:

- grid: {sequence lengths} x {kv_cache on/off} x {5 images} x {5 runs},
- greedy decoding (temperature 0.0), fp16-analog bf16 weights,
- prefill excluded from timing; peak memory measured over decode only,
- first 32 tokens excluded as warm-up; steady-state tok/s and ms/token over
  the remainder,
- cached-vs-uncached token-identity correctness check with first-10-token
  mismatch diagnostics (ablation_study_fixed.py:427-440),
- ``ablation_results/results_detailed.json`` (per-run records) and
  ``summary_statistics.json`` (mean / 95% CI / std per config) with the
  reference's exact field layout, plus the printed results table, speedup
  summary, and publication checklist.

TPU-native differences (documented, deliberate):
- timing fences are device round-trips at phase boundaries instead of
  per-token ``cuda.synchronize`` — this backend is reached over a network
  tunnel whose ~60 ms RTT would otherwise measure the tunnel, not the chip;
  decode steps are enqueued back-to-back exactly as the XLA program executes
  them (the steady-state region is still bounded by real data fences),
- the no-cache arm re-runs a full bidirectional forward over a statically
  padded buffer with a validity mask — semantically identical to the
  reference's re-concat loop (ablation_study_fixed.py:244-251) but
  jit-stable,
- peak memory via PJRT ``memory_stats()`` where the backend exposes it.

Images: the reference pulls 5 MS-COCO val2017 images from signed GCS URLs
with a red-placeholder fallback (ablation_study_fixed.py:65-75). This
environment is zero-egress, so images are synthesized deterministically per
coco_id (throughput is content-independent); drop real files into
``ablation_results/images/coco_{id}.jpg`` to measure on them instead.
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import time

import numpy as np

OUTPUT_DIR = "ablation_results"
NUM_RUNS_PER_IMAGE = 5
WARMUP_TOKENS = 32
SEQUENCE_LENGTHS = [128, 256, 512]

# Protocol parity with the reference benchmark set (ablation_study_fixed.py:28-54):
# same coco ids and prompts; URLs omitted (zero-egress — synthesized fallback).
COCO_BENCHMARK = [
    {"coco_id": "000000000285", "prompt": "Describe this image in detail, including the animal's appearance, surroundings, lighting, and mood"},
    {"coco_id": "000000005529", "prompt": "Describe everything you see in this image, including what the man is doing and where he is doing it"},
    {"coco_id": "000000012667", "prompt": "Describe everything you see in this image, including the food items, objects, colors, and setting"},
    {"coco_id": "000000024919", "prompt": "Provide a comprehensive description of this landscape, including animals, terrain, sky, lighting, atmosphere, and visual composition"},
    {"coco_id": "000000013597", "prompt": "Analyze this image thoroughly, describing the subject, lighting, composition, mood, and any artistic elements"},
]


def mean_confidence_interval(data, confidence=0.95):
    """mean ± 95% CI via Student's t (reference: ablation_study_fixed.py:56-63)."""
    a = np.asarray(data, dtype=np.float64)
    n = len(a)
    m = float(np.mean(a))
    if n < 2:
        return m, 0.0
    try:
        from scipy import stats

        se = stats.sem(a)
        h = float(se * stats.t.ppf((1 + confidence) / 2.0, n - 1))
    except ImportError:  # pragma: no cover
        se = float(np.std(a, ddof=1) / np.sqrt(n))
        h = 1.96 * se
    return m, h


def get_image(item, images_dir):
    """Load a real benchmark image if present, else synthesize one
    deterministically (analog of the red-placeholder fallback,
    ablation_study_fixed.py:65-75)."""
    from PIL import Image

    path = os.path.join(images_dir, f"coco_{item['coco_id']}.jpg")
    if os.path.exists(path):
        return Image.open(path).convert("RGB"), path
    rng = np.random.RandomState(int(item["coco_id"]) % (2**31))
    arr = rng.randint(0, 255, (480, 640, 3), np.uint8)
    img = Image.fromarray(arr)
    os.makedirs(images_dir, exist_ok=True)
    img.save(path)
    return img, path


class Runner:
    """Holds jitted closures for the cached and uncached decode arms.

    Prompts are right-padded to a fixed bucket with validity masking (via the
    batched-serving prefill/decode, which is proven token-identical to
    unpadded batch-1 decoding in tests/test_serving.py) so every image shares
    ONE compiled program per arm per length — jit-stable static shapes where
    the reference relies on dynamic torch shapes.
    """

    def __init__(self, params, cfg, dtype, max_new_tokens, prompt_bucket=None):
        import jax
        import jax.numpy as jnp

        from paligemma_tpu import generation
        from paligemma_tpu.models import paligemma

        self.jax, self.jnp = jax, jnp
        self.params, self.cfg, self.dtype = params, cfg, dtype
        self.generation = generation
        self.paligemma = paligemma
        # ONE static shape for the whole grid: prompts bucket to a fixed
        # length and the cache/no-cache buffers are sized for the longest
        # sequence — every arm/length shares the same compiled programs
        # (remote compiles on this backend cost ~3.5 min each; per-length
        # shapes would mean ~8 of them).
        n_img = cfg.vision_config.num_image_tokens
        self.prompt_bucket = prompt_bucket or (-(-(n_img + 256) // 128) * 128)
        self.max_new = max_new_tokens

        @functools.partial(jax.jit, static_argnames=())
        def nocache_step(params, ids_buf, pix, valid_len, temperature, key):
            """One uncached step: full bidirectional forward over the padded
            buffer; select from the last valid position; write the new token."""
            logits = paligemma.forward_nocache(params, cfg, ids_buf, pix, valid_len)
            last = jnp.take_along_axis(
                logits, (valid_len - 1)[:, None, None].astype(jnp.int32), axis=1
            )[:, 0, :]
            from paligemma_tpu.ops.sampling import greedy, sample_top_p

            tok = jax.lax.cond(
                temperature > 0.0,
                lambda: sample_top_p(last, key, jnp.maximum(temperature, 1e-6), 0.9),
                lambda: greedy(last),
            )
            new_buf = jax.vmap(
                lambda row, t, pos: jax.lax.dynamic_update_slice(row, t[None], (pos,))
            )(ids_buf, tok, valid_len.astype(jnp.int32))
            return tok, new_buf

        self.nocache_step = nocache_step

    def fence(self, x):
        """Device round-trip — the TPU analog of cuda.synchronize."""
        return np.asarray(x)

    def _bucket(self, ids):
        """Right-pad ids to the fixed bucket; returns (padded, valid, bucket)."""
        jnp = self.jnp
        t0 = ids.shape[1]
        bucket = self.prompt_bucket
        assert t0 <= bucket, f"prompt {t0} exceeds bucket {bucket}"
        padded = jnp.zeros((ids.shape[0], bucket), jnp.int32)
        padded = padded.at[:, :t0].set(ids)
        valid = jnp.full((ids.shape[0],), t0, jnp.int32)
        return padded, valid, bucket

    def run_cached(self, ids, pix, max_tokens, temperature):
        jax, jnp = self.jax, self.jnp
        from paligemma_tpu import serving
        from paligemma_tpu.ops.sampling import greedy, sample_top_p

        ids_p, valid, bucket = self._bucket(ids)
        cache = self.generation.make_cache(
            self.cfg, ids.shape[0], bucket, self.max_new, self.dtype
        )

        # Prefill phase — untimed (reference: ablation_study_fixed.py:193-202).
        logits, cache = serving.batched_prefill(
            self.params, self.cfg, ids_p, pix, valid, cache
        )
        self.fence(logits)

        do_sample = temperature > 0.0
        key = jax.random.PRNGKey(0)

        t_total0 = time.perf_counter()
        if do_sample:
            key, sub = jax.random.split(key)
            tok = sample_top_p(logits, sub, temperature, 0.9)
        else:
            tok = greedy(logits)
        chunks = [tok[:, None]]

        # Decode in compiled multi-step chunks (zero per-token host traffic):
        # warm-up region = the 31 steps after the prefill token, then the
        # steady-state region in 16-step chunks.
        def run_chunk(tok, cache, key, n):
            key, sub = jax.random.split(key)
            toks, tok, cache = serving.batched_decode_steps(
                self.params, self.cfg, tok[:, None], cache, valid, sub,
                n, do_sample, float(temperature), 0.9, bucket,
            )
            return toks, tok[:, 0], cache, key

        decode_start_time = None
        if max_tokens > WARMUP_TOKENS:
            toks, tok, cache, key = run_chunk(tok, cache, key, WARMUP_TOKENS - 1)
            chunks.append(toks)
            self.fence(tok)  # fence the warm-up region
            decode_start_time = time.perf_counter()
            remaining = max_tokens - WARMUP_TOKENS
        else:
            remaining = max_tokens - 1
        step_chunk = 16
        while remaining > 0:
            n = min(step_chunk, remaining)
            toks, tok, cache, key = run_chunk(tok, cache, key, n)
            chunks.append(toks)
            remaining -= n
        stacked = jnp.concatenate(chunks, axis=1)  # one host fetch = fence
        token_ids = [int(x) for x in stacked[0].tolist()]
        t_end = time.perf_counter()
        return token_ids, t_total0, decode_start_time, t_end

    def run_uncached(self, ids, pix, max_tokens, temperature):
        jax, jnp = self.jax, self.jnp
        b = ids.shape[0]
        ids_p, valid, bucket = self._bucket(ids)
        # Per-length buffer: the uncached arm's cost must scale with the
        # actual sequence length (the scaling curve is the point of the
        # ablation); one compile per length, absorbed by the per-config
        # warm-up run.
        buf = jnp.concatenate(
            [ids_p, jnp.zeros((b, max_tokens), jnp.int32)], axis=1
        )
        key = jax.random.PRNGKey(0)

        # Warm-up/compile of the uncached step happens on the first call of a
        # given shape; run one throwaway step first (untimed), mirroring the
        # reference's warm-up forward (ablation_study_fixed.py:381-391).
        tok, _ = self.nocache_step(self.params, buf, pix, valid,
                                   jnp.float32(temperature), key)
        self.fence(tok)

        temp_arr = jnp.float32(temperature)
        t_total0 = time.perf_counter()
        tokens = []
        decode_start_time = None
        for step in range(max_tokens):
            if step == WARMUP_TOKENS:
                self.fence(tokens[-1] if tokens else tok)
                decode_start_time = time.perf_counter()
            if temperature > 0.0:
                key, sub = jax.random.split(key)
            else:
                sub = key  # greedy: key unused, skip per-step split RPCs
            tok, buf = self.nocache_step(
                self.params, buf, pix, valid, temp_arr, sub
            )
            valid = valid + 1
            tokens.append(tok)
        stacked = jnp.stack(tokens)  # one host fetch = the closing fence
        token_ids = [int(x) for x in stacked[:, 0].tolist()]
        t_end = time.perf_counter()
        return token_ids, t_total0, decode_start_time, t_end


def run_inference(runner, processor, image_path, prompt, config, return_tokens=False):
    """One measured run (reference: ablation_study_fixed.py:168-287)."""
    from PIL import Image
    import jax.numpy as jnp

    from paligemma_tpu.utils.memory import peak_memory_mb

    image = Image.open(image_path).convert("RGB")
    inputs = processor(text=[prompt], images=[image])
    ids = jnp.asarray(inputs["input_ids"])
    pix = jnp.asarray(inputs["pixel_values"], runner.dtype)

    max_tokens = config["max_tokens"]
    temperature = config["temperature"]

    if config["kv_cache"]:
        token_ids, t0, t_decode, t_end = runner.run_cached(ids, pix, max_tokens, temperature)
    else:
        token_ids, t0, t_decode, t_end = runner.run_uncached(ids, pix, max_tokens, temperature)

    peak_memory = peak_memory_mb()
    if peak_memory == 0:
        # Backend exposes no memory_stats (tunneled PJRT): report an analytic
        # in-use lower bound — params + KV cache (+ padded ids buffer).
        from paligemma_tpu.utils.memory import estimate_live_mb

        peak_memory = estimate_live_mb(runner.params)
        if config["kv_cache"]:
            tc = runner.cfg.text_config
            cache_bytes = (
                2 * tc.num_hidden_layers
                * (runner.prompt_bucket + runner.max_new)
                * tc.num_key_value_heads * tc.head_dim
                * jnp.dtype(runner.dtype).itemsize
            )
            peak_memory += cache_bytes / 1024 / 1024
    total_latency_ms = (t_end - t0) * 1000
    num_tokens = len(token_ids)
    decode_start_step = WARMUP_TOKENS if t_decode is not None else 0

    if t_decode is not None and num_tokens > decode_start_step:
        decode_latency_s = t_end - t_decode
        decode_tokens = num_tokens - decode_start_step
        steady_state_tps = decode_tokens / decode_latency_s if decode_latency_s > 0 else 0
        steady_state_ms_per_token = (decode_latency_s * 1000) / decode_tokens
    else:
        steady_state_tps = num_tokens / (total_latency_ms / 1000) if total_latency_ms > 0 else 0
        steady_state_ms_per_token = total_latency_ms / num_tokens if num_tokens else 0

    decoded = processor.tokenizer.decode(token_ids, skip_special_tokens=True)

    result = {
        "output": decoded,
        "total_latency_ms": total_latency_ms,
        "tokens_generated": num_tokens,
        "warmup_tokens": decode_start_step,
        "steady_state_tokens": num_tokens - decode_start_step,
        "peak_memory_mb": peak_memory,
        "steady_state_tps": steady_state_tps,
        "steady_state_ms_per_token": steady_state_ms_per_token,
        "total_ms_per_token": total_latency_ms / num_tokens if num_tokens else 0,
    }
    if return_tokens:
        result["token_ids"] = token_ids
    return result


def build_model(args):
    import jax
    import jax.numpy as jnp

    from paligemma_tpu.models import paligemma
    from paligemma_tpu.processing import ByteTokenizer, PaliGemmaProcessor

    if args.model_path:
        from paligemma_tpu.utils.checkpoint import load_model
        from transformers import AutoTokenizer

        params, cfg = load_model(args.model_path, dtype=jnp.bfloat16)
        tokenizer = AutoTokenizer.from_pretrained(args.model_path, padding_side="right")
        dtype = jnp.bfloat16
        processor = PaliGemmaProcessor(
            tokenizer, cfg.vision_config.num_image_tokens, cfg.vision_config.image_size
        )
        return params, cfg, processor, dtype

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    if args.smoke or not on_tpu:
        from paligemma_tpu.config import tiny_config

        cfg = tiny_config()
        dtype = jnp.float32
    else:
        from paligemma_tpu.config import (
            paligemma_3b_pt_224, paligemma_3b_pt_448, paligemma_3b_pt_896)

        cfg = {224: paligemma_3b_pt_224, 448: paligemma_3b_pt_448,
               896: paligemma_3b_pt_896}[args.res]()
        dtype = jnp.bfloat16

    tokenizer = ByteTokenizer()
    processor = PaliGemmaProcessor(
        tokenizer, cfg.vision_config.num_image_tokens, cfg.vision_config.image_size
    )
    from paligemma_tpu.processing import align_config

    cfg = align_config(cfg, processor)  # image id + BOTH vocab sizes
    params = paligemma.init_params(cfg, jax.random.PRNGKey(0), dtype)
    return params, cfg, processor, dtype


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--output_dir", type=str, default=OUTPUT_DIR)
    p.add_argument("--smoke", action="store_true",
                   help="reduced grid for CI: 2 images, 2 runs, short lengths")
    p.add_argument("--quant", choices=["none", "int8"], default="none",
                   help="int8: run the grid with weight-only-quantized decoder")
    p.add_argument("--res", type=int, choices=[224, 448, 896], default=224,
                   help="model resolution geometry (448/896 extend the "
                        "paper-analog beyond the reference's fixed 224; "
                        "decode is geometry-identical, the no-cache arm "
                        "pays the larger bidirectional prefill per step)")
    p.add_argument("--prefill_a8", action="store_true",
                   help="with --quant int8: route prefill-shaped GEMMs "
                        "(T >= runtime.a8_min_seq) through both-operand-"
                        "int8 MXU matmuls. In this grid it accelerates the "
                        "NO-CACHE arm (full >=128-token forwards per step) "
                        "and the untimed prefill — so it REDUCES the "
                        "headline cache-speedup ratio while making both "
                        "arms faster in absolute terms")
    args = p.parse_args(argv)
    if args.res != 224 and args.output_dir == OUTPUT_DIR:
        args.output_dir = f"{OUTPUT_DIR}_{args.res}"
    if args.prefill_a8:
        if args.quant != "int8":
            p.error("--prefill_a8 requires --quant int8")
        if args.output_dir in (OUTPUT_DIR, f"{OUTPUT_DIR}_int8"):
            args.output_dir = f"{OUTPUT_DIR}_int8_a8"
    from paligemma_tpu import runtime as _rt

    # CLI-authoritative over the PALIGEMMA_PREFILL_A8 env default, set
    # before any jit trace (same rule as bench_continuous/server).
    _rt.set_prefill_a8(bool(args.prefill_a8))
    if args.smoke and not os.path.normpath(args.output_dir).endswith("_smoke"):
        # A smoke run must never clobber measured grids (results_detailed /
        # summary_statistics are the round's published data — this includes
        # the int8 grid dir and any path spelling of the defaults): redirect
        # any non-"_smoke" target.
        args.output_dir = os.path.normpath(args.output_dir) + "_smoke"
        print(f"[smoke] writing to {args.output_dir} "
              "(measured grids are never overwritten by smoke runs)")

    num_runs = 2 if args.smoke else NUM_RUNS_PER_IMAGE
    lengths = [40] if args.smoke else SEQUENCE_LENGTHS
    bench = COCO_BENCHMARK[:2] if args.smoke else COCO_BENCHMARK

    import jax

    print("=" * 80)
    print("PALIGEMMA KV-CACHE ABLATION STUDY — TPU")
    print("=" * 80)
    print(f"Device: {jax.devices()[0]}")
    print(f"Sequence lengths: {lengths}")
    print(f"Runs per configuration: {num_runs}")
    total = len(bench) * len(lengths) * 2 * num_runs
    print(f"Total experiments: {len(bench)} x {len(lengths)} x 2 x {num_runs} = {total}")
    print("=" * 80 + "\n")

    os.makedirs(args.output_dir, exist_ok=True)
    images_dir = os.path.join(args.output_dir, "images")
    os.makedirs(images_dir, exist_ok=True)

    print("Step 1: Preparing benchmark images...")
    for item in bench:
        _, item["image_path"] = get_image(item, images_dir)
    print("ok\n")

    print("Step 2: Loading model...")
    params, cfg, processor, dtype = build_model(args)
    if args.quant == "int8":
        from paligemma_tpu.quantization import quantize_params

        params = quantize_params(params, llm_only=True)
        print("  int8 weight-only quantization applied (llm_only)")
    runner = Runner(params, cfg, dtype, max_new_tokens=max(lengths))
    print("ok\n")

    print("Step 3: Warmup run...")
    warm_cfg = {"kv_cache": True, "temperature": 0.0, "max_tokens": 4}
    run_inference(runner, processor, bench[0]["image_path"], "warmup", warm_cfg)
    print("ok\n")

    print("Step 4: Running experiments with statistical rigor...\n")
    results = []
    baseline_outputs = {}

    for max_tokens in lengths:
        configs = [
            {"name": f"kv_cache_{max_tokens}", "kv_cache": True, "temperature": 0.0, "max_tokens": max_tokens},
            {"name": f"no_kv_cache_{max_tokens}", "kv_cache": False, "temperature": 0.0, "max_tokens": max_tokens},
        ]
        for config in configs:
            print(f"\nCONFIG: {config['name']}")
            # Per-config compile warm-up, discarded (the reference's warm-up
            # run serves the same role, ablation_study_fixed.py:381-391; here
            # it also absorbs the scan-chunk compiles for this length).
            run_inference(runner, processor, bench[0]["image_path"],
                          bench[0]["prompt"], config)
            for img_idx, item in enumerate(bench):
                print(f"  Image {img_idx + 1}/{len(bench)}: COCO {item['coco_id']}")
                for run_id in range(num_runs):
                    metrics = run_inference(
                        runner, processor, item["image_path"], item["prompt"],
                        config, return_tokens=True,
                    )
                    # Correctness check (reference: ablation_study_fixed.py:427-440)
                    key = f"{max_tokens}_{img_idx}"
                    if config["kv_cache"] and run_id == 0:
                        baseline_outputs[key] = metrics["token_ids"]
                    elif not config["kv_cache"] and run_id == 0 and key in baseline_outputs:
                        match = baseline_outputs[key] == metrics["token_ids"]
                        metrics["tokens_identical"] = match
                        if not match:
                            print("    WARNING: Token mismatch detected!")
                            print(f"    Baseline (first 10): {baseline_outputs[key][:10]}")
                            print(f"    Current (first 10):  {metrics['token_ids'][:10]}")
                    results.append({
                        "config_name": config["name"],
                        "kv_cache": config["kv_cache"],
                        "max_tokens_target": max_tokens,
                        "temperature": config["temperature"],
                        "coco_id": item["coco_id"],
                        "image_id": img_idx,
                        "run_id": run_id,
                        "prompt": item["prompt"],
                        **{k: v for k, v in metrics.items() if k != "token_ids"},
                    })
                    print(f"    Run {run_id + 1}/{num_runs}: "
                          f"{metrics['steady_state_ms_per_token']:.1f} ms/tok")

    with open(os.path.join(args.output_dir, "results_detailed.json"), "w") as f:
        json.dump(results, f, indent=2)

    summary = {}
    for max_tokens in lengths:
        for use_cache in [True, False]:
            config_name = f"{'kv_cache' if use_cache else 'no_kv_cache'}_{max_tokens}"
            config_results = [r for r in results if r["config_name"] == config_name]
            if not config_results:
                continue
            tps = [r["steady_state_tps"] for r in config_results]
            mspt = [r["steady_state_ms_per_token"] for r in config_results]
            mem = [r["peak_memory_mb"] for r in config_results]
            tps_m, tps_ci = mean_confidence_interval(tps)
            ms_m, ms_ci = mean_confidence_interval(mspt)
            mem_m, mem_ci = mean_confidence_interval(mem)
            summary[config_name] = {
                "sequence_length": max_tokens,
                "kv_cache_enabled": use_cache,
                "num_samples": len(config_results),
                "steady_state_tps": {"mean": round(tps_m, 2), "ci_95": round(tps_ci, 2),
                                     "std": round(float(np.std(tps)), 2)},
                "steady_state_ms_per_token": {"mean": round(ms_m, 2), "ci_95": round(ms_ci, 2),
                                              "std": round(float(np.std(mspt)), 2)},
                "peak_memory_mb": {"mean": round(mem_m, 2), "ci_95": round(mem_ci, 2),
                                   "std": round(float(np.std(mem)), 2)},
                "tokens_generated": {
                    "mean": round(float(np.mean([r["tokens_generated"] for r in config_results])), 1)
                },
            }

    with open(os.path.join(args.output_dir, "summary_statistics.json"), "w") as f:
        json.dump(summary, f, indent=2)

    print("\n" + "=" * 80)
    print("RESULTS")
    print("=" * 80)
    print(f"\n{'Configuration':<30} {'ms/token (±CI)':<20} {'tok/s (±CI)':<20} {'HBM (MB)':<15}")
    print("-" * 90)
    for max_tokens in lengths:
        print(f"\nSequence Length: {max_tokens}")
        for use_cache in [True, False]:
            name = f"{'kv_cache' if use_cache else 'no_kv_cache'}_{max_tokens}"
            if name in summary:
                s = summary[name]
                print(f"  {'KV-cache' if use_cache else 'No cache':<28} "
                      f"{s['steady_state_ms_per_token']['mean']:.1f} ±{s['steady_state_ms_per_token']['ci_95']:.2f}{'':>8} "
                      f"{s['steady_state_tps']['mean']:.1f} ±{s['steady_state_tps']['ci_95']:.2f}{'':>8} "
                      f"{s['peak_memory_mb']['mean']:.0f}")

    print("\n" + "=" * 80)
    print("KEY FINDINGS")
    print("=" * 80)
    for max_tokens in lengths:
        ck, nk = f"kv_cache_{max_tokens}", f"no_kv_cache_{max_tokens}"
        if ck in summary and nk in summary:
            speedup = (summary[nk]["steady_state_ms_per_token"]["mean"]
                       / max(summary[ck]["steady_state_ms_per_token"]["mean"], 1e-9))
            print(f"\nSequence Length {max_tokens}: speedup {speedup:.2f}x")

    print("\n" + "=" * 80)
    print("PUBLICATION CHECKLIST")
    print("=" * 80)
    print(f"+ Multiple sequence lengths: {lengths}")
    print(f"+ Statistical rigor: {num_runs} runs per config, 95% CI reported")
    print("+ Canonical protocol: MS-COCO val2017 ids + prompts (images synthesized offline)")
    print("+ Correctness: cached-vs-uncached token identity checked, divergences logged")
    print("+ Memory isolation: decode-phase peak where the backend exposes it")
    print(f"+ Total samples: {len(results)}")
    return summary


if __name__ == "__main__":
    main()
