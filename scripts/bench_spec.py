"""Speculative (n-gram/prompt-lookup) decode vs plain chunked decode on TPU.

Decode is weight-streaming-bound (3.56 ms device-busy per token at int8,
REPORT.md round 3), so a k-token verify step costs nearly the same HBM
traffic as a 1-token step — speedup ~= tokens accepted per verify. The
draft is checkpoint-free (context n-gram lookup), so acceptance depends
entirely on output repetitiveness; this reports BOTH the timing and the
measured tokens/verify so the speedup can be attributed.

Caveat printed with the results: random-weight greedy text is often
near-cyclic, which flatters acceptance vs real checkpoints; the honest
headline claim is the measured ms/token AT the measured acceptance.

Usage: python scripts/bench_spec.py [--quant int8|w4a8] [--ks 4,8,16]
       [--tokens 256]

``--replay`` runs the ACCEPTANCE SENSITIVITY harness instead (VERDICT r3
#4): every round-3 speculative throughput claim rides the random-weight
~2.0 tokens/verify, which may not transfer to real checkpoints. Replay
teacher-forces drafts through the REAL verify path (k-token forward over
the warm cache + argmax + prefix-accept) with a deterministic per-iteration
count of correct drafts, producing an acceptance -> ms/token curve at
acceptance in {1.0, 1.5, 2.0, 3.0, k} and the break-even acceptance vs
plain chunked decode. Drafts are taken from (or corrupted against) a
recorded plain-greedy oracle stream of the same model, so the device work
per verify is byte-identical to production speculation at that acceptance.
"""
from __future__ import annotations

import argparse
import functools
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


def log(m):
    print(m, file=sys.stderr, flush=True)


@functools.partial(jax.jit, static_argnames=("cfg", "k"))
def decode_steps_replay(params, cfg, token, cache, oracle, pos, pattern, k):
    """``len(pattern)`` verify iterations with teacher-forced drafts.

    ``oracle`` (L,) int32: the model's own plain-greedy continuation (so the
    device argmax at every verified position equals oracle[...] by
    construction). Iteration i presents drafts 1..pattern[i] correct (from
    the oracle) and the rest corrupted (+1 mod vocab, guaranteed wrong), so
    it accepts exactly pattern[i]+1 tokens — the REAL verify compute at a
    controlled acceptance rate. Returns (token, cache, pos, accepts)."""

    def body(carry, m):
        token, cache, pos = carry
        idx = pos + 1 + jnp.arange(k - 1)
        correct = jnp.take(oracle, jnp.minimum(idx, oracle.shape[0] - 1))
        wrong = (correct + 1) % cfg.text_config.vocab_size
        drafts = jnp.where(jnp.arange(1, k) <= m, correct, wrong)[None, :]
        inp = jnp.concatenate([token, drafts.astype(jnp.int32)], axis=1)
        logits, vcache = paligemma.verify_step(params, cfg, inp, cache)
        a = jnp.argmax(logits[0].astype(jnp.float32), axis=-1).astype(jnp.int32)
        matched = jnp.sum(
            jnp.cumprod((inp[0, 1:] == a[:-1]).astype(jnp.int32)))
        accept = matched + 1
        cache = vcache._replace(length=cache.length + accept)
        token = jax.lax.dynamic_slice(a, (matched,), (1,))[None, :]
        return (token, cache, pos + accept), accept

    (token, cache, pos), accepts = jax.lax.scan(
        body, (token, cache, pos), pattern)
    return token, cache, pos, accepts


def run_replay(params, cfg, ids, pix, dtype, k, tokens, windows):
    """Acceptance -> ms/token curve through the real verify path.

    A FIXED verify-iteration count across every acceptance level (produced
    tokens vary instead) keeps ONE compiled program + ONE cache shape for
    the whole curve — one jit shape costs minutes on the remote-compile
    backend (CLAUDE.md)."""
    import numpy as np

    n_iters = max(tokens // 2, 16)
    alloc = n_iters * k + 2 * k + 8
    # Oracle: the model's own greedy stream, long enough for full acceptance.
    oracle_list = generation.generate_chunked(
        params, cfg, ids, pix, max_new_tokens=alloc,
        eos_token_id=-1, cache_dtype=dtype, chunk=64)
    oracle = jnp.asarray(oracle_list, jnp.int32)
    t = ids.shape[1]
    # Prefill once; the warm cache is immutable, so every timed run restarts
    # from it and times ONLY the verify chain (the one packed fetch is the
    # completion fence, CLAUDE.md).
    cache0 = generation.make_cache(cfg, 1, t, alloc, dtype)
    _, cache0 = generation._prefill_jit(params, cfg, ids, pix, cache0)

    # Deterministic patterns: m correct drafts -> accept m+1 every iteration
    # (1.5 alternates 1/2). Levels above k are skipped.
    levels = {
        "1.0": lambda n: np.zeros(n, np.int32),
        "1.5": lambda n: np.tile([0, 1], -(-n // 2))[:n].astype(np.int32),
        "2.0": lambda n: np.ones(n, np.int32),
        "3.0": lambda n: np.full(n, 2, np.int32),
        str(float(k)): lambda n: np.full(n, k - 1, np.int32),
    }
    out = {}
    for name, make in levels.items():
        if float(name) > k:
            continue
        pattern = jnp.asarray(make(n_iters))
        produced_target = int(np.sum(np.asarray(pattern) + 1))

        def run():
            token = oracle[:1][None, :]
            pos = jnp.zeros((), jnp.int32)
            token, cache, pos2, accepts = decode_steps_replay(
                params, cfg, token, cache0, oracle, pos, pattern, k)
            return np.asarray(
                jnp.concatenate([pos2[None], accepts]))  # ONE fetch

        packed = run()  # compile (first level only — one shape for all)
        # Self-check: the verify accepted exactly the forced counts (the
        # oracle really is the model's argmax stream).
        assert int(packed[0]) == produced_target, (
            name, int(packed[0]), produced_target)
        assert np.array_equal(packed[1:], np.asarray(pattern) + 1)
        best = float("inf")
        for _ in range(windows):
            t0 = time.time()
            packed = run()
            best = min(best, (time.time() - t0) * 1000 / int(packed[0]))
        out[name] = round(best, 3)
        log(f"  acceptance {name}: {best:.3f} ms/token "
            f"({n_iters} verifies, {produced_target} tokens)")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", choices=["bf16", "int8", "w4a8"],
                    default="int8")
    ap.add_argument("--ks", default="4,8,16")
    ap.add_argument("--tokens", type=int, default=256)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--replay", action="store_true",
                    help="acceptance-sensitivity harness: teacher-forced "
                         "drafts through the real verify path at controlled "
                         "acceptance (see module docstring)")
    ap.add_argument("--sampled", action="store_true",
                    help="measure the SAMPLED speculative path (temperature "
                         "0.8, top-p 0.9) against plain sampled decoding — "
                         "distribution parity, so no token-identity check")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out_name = args.out or (
        f"spec_bench_{args.quant}_sampled.json" if args.sampled
        else f"spec_bench_{args.quant}.json")

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    cfg = paligemma_3b_pt_224() if on_tpu else tiny_config()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    params = paligemma.init_params(cfg, jax.random.PRNGKey(0), dtype)
    jax.block_until_ready(params)
    if args.quant in ("int8", "w4a8"):
        params = quantize_params(params, llm_only=True, mode=args.quant)
        jax.block_until_ready(params)
    log(f"params ready ({args.quant})")

    n_img = cfg.vision_config.num_image_tokens
    # Prompt with some internal structure (repeated phrase), as document VQA
    # prompts have; the generated continuation's repetitiveness is up to the
    # (random) model.
    phrase = [101, 102, 103, 104, 105, 106, 107, 108]
    text = (phrase + [7, 9]) * 3
    ids = jnp.asarray([[cfg.image_token_index] * n_img + text], jnp.int32)
    size = cfg.vision_config.image_size
    pix = jax.random.normal(jax.random.PRNGKey(2), (1, 3, size, size), dtype)

    results = {"quant": args.quant, "tokens": args.tokens,
               "sampled": args.sampled}
    sample_kw = (
        dict(do_sample=True, temperature=0.8, top_p=0.9) if args.sampled
        else {}
    )

    # Baseline: plain chunked decode (chunk 64, the production config).
    import jax as _jax

    def run_plain():
        return generation.generate_chunked(
            params, cfg, ids, pix, max_new_tokens=args.tokens,
            eos_token_id=-1, cache_dtype=dtype, chunk=64,
            key=_jax.random.PRNGKey(0), **sample_kw)

    base = run_plain()  # compile
    best = float("inf")
    for _ in range(args.windows):
        t0 = time.time()
        got = run_plain()
        best = min(best, (time.time() - t0) * 1000 / args.tokens)
    if not args.sampled:
        assert got == base
    results["plain_ms_per_tok"] = round(best, 3)
    log(f"plain chunk64: {best:.3f} ms/token")

    if args.replay:
        results["replay"] = {}
        for k in [int(x) for x in args.ks.split(",")]:
            log(f"replay k={k}:")
            curve = run_replay(
                params, cfg, ids, pix, dtype, k, args.tokens, args.windows)
            # Break-even acceptance vs plain: linear interpolation on the
            # measured curve (ms/token falls with acceptance).
            pts = sorted((float(a), ms) for a, ms in curve.items())
            be = None
            for (a0, m0), (a1, m1) in zip(pts, pts[1:]):
                if (m0 - best) * (m1 - best) <= 0 and m0 != m1:
                    be = a0 + (a1 - a0) * (m0 - best) / (m0 - m1)
                    break
            if be is None and pts and pts[0][1] <= best:
                be = pts[0][0]  # wins everywhere measured
            results["replay"][f"k{k}"] = {
                "curve_ms_per_tok": curve,
                "break_even_acceptance": round(be, 2) if be else None,
            }
            log(f"  break-even acceptance vs plain: "
                f"{results['replay'][f'k{k}']['break_even_acceptance']}")
        out_name = args.out or f"spec_replay_{args.quant}.json"
        with open(out_name, "w") as f:
            json.dump(results, f, indent=2)
        log(json.dumps(results))
        return

    for k in [int(x) for x in args.ks.split(",")]:
        stats = {}

        def run_spec():
            return generation.generate_spec(
                params, cfg, ids, pix, max_new_tokens=args.tokens,
                eos_token_id=-1, cache_dtype=dtype, chunk=64, k=k, n=3,
                key=_jax.random.PRNGKey(0), stats=stats, **sample_kw)

        spec = run_spec()  # compile
        identical = spec == base
        bestk = float("inf")
        for _ in range(args.windows):
            t0 = time.time()
            spec = run_spec()
            bestk = min(bestk, (time.time() - t0) * 1000 / args.tokens)
        results[f"spec_k{k}_ms_per_tok"] = round(bestk, 3)
        results[f"spec_k{k}_tokens_per_verify"] = stats["tokens_per_verify"]
        if not args.sampled:
            results[f"spec_k{k}_identical"] = bool(identical and spec == base)
        log(f"spec k={k}: {bestk:.3f} ms/token, "
            f"{stats['tokens_per_verify']} tok/verify"
            + ("" if args.sampled
               else f", identical={results[f'spec_k{k}_identical']}"))

    with open(out_name, "w") as f:
        json.dump(results, f, indent=2)
    log(json.dumps(results))


if __name__ == "__main__":
    main()
