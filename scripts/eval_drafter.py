"""Drafter-quality eval: teacher-forced ORACLE acceptance on natural text.

Speculative throughput = f(acceptance), and acceptance factorizes as
  P(model emits draft) = P(text continues as drafted | model reproduces text)
where the second factor is ALL the drafter controls. This measures it
directly, no model or TPU needed: walk real token streams, propose k-1
drafts at every position from the true prefix, and count the longest prefix
that matches the ACTUAL continuation — i.e. acceptance under a perfect
(text-reproducing) verifier. The n-gram-vs-longest-match comparison this
produces is the drafter delta that serving acceptance inherits at any model
quality (the model factor multiplies both drafters identically in
expectation).

Corpus: by default the repo's own markdown/prose byte-tokenized with the
shipped ByteTokenizer (natural English + technical structure — the
financial-document register the reference targets is closer to this than to
the near-cyclic random-weight greedy text that flatters the fixed n-gram,
scripts/bench_spec.py caveat). Pass file paths to override.

Usage: python scripts/eval_drafter.py [files...] [--k 8] [--out drafter_eval.json]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


def accepted_counts(tokens: np.ndarray, k: int, drafter: str,
                    warmup: int, stride: int, history: int = 1536,
                    pos_chunk: int = 128) -> np.ndarray:
    """For each eval position p (buf_len=p, last token tokens[p-1]): propose
    k-1 drafts from the last ``history`` tokens of tokens[:p], compare with
    tokens[p:p+k-1], return the per-position count of ACCEPTED tokens per
    verify (1 + longest matching draft prefix — the emitted-tokens-per-verify
    the engine sees). ``history`` mirrors a serving slot's bounded ids_buf
    (prompt + max_new ~ 800-1400 tokens) and bounds the vmapped comparison
    block to pos_chunk x history x n_max."""
    import functools

    import jax
    import jax.numpy as jnp

    from paligemma_tpu import generation

    L = len(tokens)
    ids = jnp.asarray(tokens, jnp.int32)
    positions = np.arange(warmup, L - k, stride, dtype=np.int32)

    @functools.partial(jax.jit, static_argnames=())
    def propose_batch(ps):
        def one(p):
            start = jnp.maximum(p - history, 0)
            win = jax.lax.dynamic_slice(ids, (start,), (history,))
            bl = jnp.minimum(p, history)
            return generation.propose_row(drafter, win, bl, win[bl - 1], k, 3)

        return jax.vmap(one)(ps)

    props = []
    for i in range(0, len(positions), pos_chunk):
        ch = positions[i:i + pos_chunk]
        if len(ch) < pos_chunk:  # pad to keep one compiled shape
            ch = np.concatenate([ch, np.full(pos_chunk - len(ch), ch[-1])])
        props.append(np.asarray(propose_batch(jnp.asarray(ch))))
    prop = np.concatenate(props)[: len(positions)]
    actual = np.stack([tokens[p:p + k - 1] for p in positions])
    eq = (prop == actual).astype(np.int64)
    matched = np.cumprod(eq, axis=1).sum(axis=1)
    return matched + 1


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("files", nargs="*", default=None)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=256,
                    help="min prefix before proposing (a serving slot has "
                         ">= 272 image+prompt tokens of context)")
    ap.add_argument("--stride", type=int, default=7)
    ap.add_argument("--max_tokens", type=int, default=20000,
                    help="per-file token cap (keeps the (P, L, n_max) "
                         "comparison block in memory)")
    ap.add_argument("--out", default="drafter_eval.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = args.files or sorted(
        glob.glob(os.path.join(repo, "*.md"))
        + glob.glob(os.path.join(repo, "docs", "*.md"))
    )
    results = {"k": args.k, "files": {}}
    agg = {d: [] for d in ("ngram", "longest")}
    for path in files:
        with open(path, "rb") as f:
            raw = f.read()[: args.max_tokens]
        # ByteTokenizer layout: ids 0..255 ARE the raw bytes (processing.py).
        tokens = np.frombuffer(raw, np.uint8).astype(np.int32)
        if len(tokens) < args.warmup + args.k + 8:
            continue
        row = {}
        for drafter in ("ngram", "longest"):
            acc = accepted_counts(
                tokens, args.k, drafter, args.warmup, args.stride)
            agg[drafter].append(acc)
            row[drafter] = round(float(acc.mean()), 4)
        row["positions"] = int(
            len(np.arange(args.warmup, len(tokens) - args.k, args.stride)))
        results["files"][os.path.relpath(path, repo)] = row
        log(f"{os.path.basename(path)}: ngram {row['ngram']} "
            f"longest {row['longest']} (n={row['positions']})")
    for d in ("ngram", "longest"):
        allv = np.concatenate(agg[d]) if agg[d] else np.zeros(1)
        results[f"{d}_tokens_per_verify"] = round(float(allv.mean()), 4)
        results[f"{d}_p50"] = float(np.median(allv))
    results["lift"] = round(
        results["longest_tokens_per_verify"]
        / max(results["ngram_tokens_per_verify"], 1e-9), 4)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: v for k, v in results.items() if k != "files"}))


if __name__ == "__main__":
    sys.exit(main() or 0)
