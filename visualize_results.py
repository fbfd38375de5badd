"""Publication figure generator — TPU analog of the reference's
``visualize_results.py``.

Emits the same 5 figures (latency, throughput, speedup, peak memory, log-log
scaling; PDF+PNG, serif, 3.5x2.5in) but reads the measured numbers from
``ablation_results/summary_statistics.json`` instead of hardcoding them
(the reference hardcodes its summary at visualize_results.py:24-36; we fall
back to those published values when no results file exists, so the script is
runnable standalone).

Chart conventions: two fixed series colors (Paul Tol bright pair — CVD-safe)
with distinct markers as secondary encoding, one axis per figure, recessive
grid, legend on multi-series figures.
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

# Fixed series identities: KV-cache = blue circle, No KV-cache = red square.
COLOR_KV = "#4477AA"
COLOR_NOKV = "#EE6677"
COLOR_SINGLE = "#228833"

# Reference-published fallback numbers (reference: visualize_results.py:24-36).
REFERENCE_SUMMARY = {
    "seq": [128, 256, 512],
    "kv_ms": [98.08, 98.35, 95.98],
    "kv_ci": [0.44, 0.12, 2.35],
    "no_kv_ms": [984.86, 1082.63, 1268.43],
    "no_kv_ci": [8.99, 2.96, 20.55],
    "kv_tps": [10.2, 10.17, 10.46],
    "kv_tps_ci": [0.05, 0.01, 0.29],
    "no_kv_tps": [1.02, 0.92, 0.79],
    "no_kv_tps_ci": [0.01, 0.0, 0.01],
    "kv_mem": [6547.58, 6547.58, 6547.58],
    "kv_mem_ci": [1.27, 1.27, 1.27],
    "no_kv_mem": [7122.91, 7437.55, 8069.92],
    "no_kv_mem_ci": [1.58, 1.5, 1.66],
}


def load_summary(path):
    """summary_statistics.json -> plot arrays; None if absent/empty."""
    if not os.path.exists(path):
        return None
    with open(path) as f:
        summary = json.load(f)
    lengths = sorted(
        {v["sequence_length"] for v in summary.values() if "sequence_length" in v}
    )
    if not lengths:
        return None

    def series(prefix, metric, field):
        return [
            summary[f"{prefix}_{n}"][metric][field]
            if f"{prefix}_{n}" in summary
            else np.nan
            for n in lengths
        ]

    return {
        "seq": lengths,
        "kv_ms": series("kv_cache", "steady_state_ms_per_token", "mean"),
        "kv_ci": series("kv_cache", "steady_state_ms_per_token", "ci_95"),
        "no_kv_ms": series("no_kv_cache", "steady_state_ms_per_token", "mean"),
        "no_kv_ci": series("no_kv_cache", "steady_state_ms_per_token", "ci_95"),
        "kv_tps": series("kv_cache", "steady_state_tps", "mean"),
        "kv_tps_ci": series("kv_cache", "steady_state_tps", "ci_95"),
        "no_kv_tps": series("no_kv_cache", "steady_state_tps", "mean"),
        "no_kv_tps_ci": series("no_kv_cache", "steady_state_tps", "ci_95"),
        "kv_mem": series("kv_cache", "peak_memory_mb", "mean"),
        "kv_mem_ci": series("kv_cache", "peak_memory_mb", "ci_95"),
        "no_kv_mem": series("no_kv_cache", "peak_memory_mb", "mean"),
        "no_kv_mem_ci": series("no_kv_cache", "peak_memory_mb", "ci_95"),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--results", default="ablation_results/summary_statistics.json")
    p.add_argument("--out_dir", default="figures")
    p.add_argument("--serving_dir",
                   default=os.path.dirname(os.path.abspath(__file__)),
                   help="directory holding continuous_bench*.json for the "
                        "serving figure (default: the repo root, so fig6 "
                        "renders regardless of cwd)")
    args = p.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.rcParams.update(
        {
            "font.size": 10,
            "font.family": "serif",
            "figure.figsize": (3.5, 2.5),
            "axes.spines.top": False,
            "axes.spines.right": False,
            "axes.linewidth": 0.8,
            "grid.linewidth": 0.5,
            "lines.linewidth": 1.5,
            "patch.linewidth": 0.5,
            "xtick.major.width": 0.8,
            "ytick.major.width": 0.8,
        }
    )

    data = load_summary(args.results)
    if data is None:
        print(f"no results at {args.results}; using reference-published numbers")
        data = REFERENCE_SUMMARY
    seq = np.asarray(data["seq"])
    os.makedirs(args.out_dir, exist_ok=True)

    def save(fig, name):
        for ext in ("pdf", "png"):
            fig.savefig(
                os.path.join(args.out_dir, f"{name}.{ext}"), dpi=300,
                bbox_inches="tight",
            )
        plt.close(fig)
        print(f"Saved: {name}.pdf")

    def two_series(ykv, ykv_ci, ynk, ynk_ci, ylabel, title, name, loglog=False):
        fig, ax = plt.subplots()
        plot = ax.errorbar
        plot(seq, ykv, yerr=ykv_ci, marker="o", capsize=3, label="KV-cache",
             markersize=5, color=COLOR_KV)
        plot(seq, ynk, yerr=ynk_ci, marker="s", capsize=3, label="No KV-cache",
             markersize=5, color=COLOR_NOKV)
        if loglog:
            ax.set_xscale("log")
            ax.set_yscale("log")
        ax.set_xlabel("Sequence Length (tokens)")
        ax.set_ylabel(ylabel)
        ax.set_title(title)
        ax.legend(frameon=False)
        ax.grid(True, alpha=0.3, which="both" if loglog else "major")
        fig.tight_layout()
        save(fig, name)

    two_series(data["kv_ms"], data["kv_ci"], data["no_kv_ms"], data["no_kv_ci"],
               "Latency (ms/token)", "Steady-State Latency vs Sequence Length",
               "fig1_latency")
    two_series(data["kv_tps"], data["kv_tps_ci"], data["no_kv_tps"],
               data["no_kv_tps_ci"], "Throughput (tokens/sec)",
               "Throughput vs Sequence Length", "fig2_throughput")

    fig, ax = plt.subplots()
    speedup = np.asarray(data["no_kv_ms"]) / np.asarray(data["kv_ms"])
    ax.plot(seq, speedup, marker="o", markersize=6, color=COLOR_SINGLE)
    for x, y in zip(seq, speedup):
        ax.text(x, y + 0.4, f"{y:.1f}x", ha="center", fontsize=9)
    ax.set_xlabel("Sequence Length (tokens)")
    ax.set_ylabel("Speedup (x)")
    ax.set_title("KV-Cache Speedup Factor")
    ax.grid(True, alpha=0.3)
    ax.set_ylim(bottom=0)
    fig.tight_layout()
    save(fig, "fig3_speedup")

    two_series(data["kv_mem"], data["kv_mem_ci"], data["no_kv_mem"],
               data["no_kv_mem_ci"], "Peak Memory (MB)",
               "Peak Decode Memory Usage", "fig4_memory")
    two_series(data["kv_ms"], None, data["no_kv_ms"], None,
               "Latency (ms/token)", "Log-Log Scaling Behavior",
               "fig5_loglog", loglog=True)

    # fig6: serving engines on the mixed-length workload (beyond the
    # reference's figure set — reads the measured continuous_bench*.json).
    serving_files = [
        ("bf16\n8 slots", "continuous_bench.json"),
        ("int8\n8 slots", "continuous_bench_int8.json"),
        ("int8\n16 slots", "continuous_bench_int8_s16c32.json"),
        ("int8\n32 slots", "continuous_bench_int8_s32c32_r256.json"),
        ("w4a8\n32 slots", "continuous_bench_w4a8_s32c32_r256_kvw.json"),
    ]
    rows = []
    for label, fname in serving_files:
        path = os.path.join(args.serving_dir, fname)
        if os.path.exists(path):
            with open(path) as f:
                d = json.load(f)
            rows.append((label, d.get("coalesced_agg_tok_s"),
                         d["continuous_agg_tok_s"]))
    if rows:
        fig, ax = plt.subplots()
        xs = np.arange(len(rows))
        w = 0.38
        ax.bar([x - w / 2 for x, r in zip(xs, rows) if r[1] is not None],
               [r[1] for r in rows if r[1] is not None], w,
               label="Window coalescing", color=COLOR_NOKV)
        ax.bar(xs + w / 2, [r[2] for r in rows], w, label="Continuous batching",
               color=COLOR_KV)
        for i, (_, c, k) in enumerate(rows):
            if c is not None:
                ax.text(i - w / 2, c, f"{c:.0f}", ha="center", va="bottom",
                        fontsize=8)
            ax.text(i + w / 2, k, f"{k:.0f}", ha="center", va="bottom", fontsize=8)
        ax.set_xticks(xs)
        ax.set_xticklabels([r[0] for r in rows], fontsize=9)
        ax.set_ylabel("Useful tokens/sec (aggregate)")
        ax.set_title("Serving Engines, Mixed-Length Workload")
        ax.legend(frameon=False, fontsize=8)
        ax.grid(True, alpha=0.3, axis="y")
        fig.tight_layout()
        save(fig, "fig6_serving")

    # fig7: continuous-serving width scaling (round-3 sweep; measured peak
    # promoted to the server defaults).
    width_files = [
        (16, "continuous_bench_int8_s16c32_r128.json"),
        (24, "continuous_bench_int8_s24c32_r128.json"),
        (32, "continuous_bench_int8_s32c32_r128.json"),
        (32, "continuous_bench_int8_s32c32_r256.json"),
        (48, "continuous_bench_int8_s48c32_r256.json"),
    ]
    pts = []
    for slots, fname in width_files:
        path = os.path.join(args.serving_dir, fname)
        if os.path.exists(path):
            with open(path) as f:
                d = json.load(f)
            pts.append((slots, d["continuous_agg_tok_s"], d["n_req"]))
    spec_files = [
        (16, "continuous_bench_int8_s16c8_r256_spec4.json"),
        (24, "continuous_bench_int8_s24c8_r256_spec4.json"),
        (32, "continuous_bench_int8_s32c8_r256_spec4.json"),
    ]
    spec_pts = []
    for slots, fname in spec_files:
        path = os.path.join(args.serving_dir, fname)
        if os.path.exists(path):
            with open(path) as f:
                d = json.load(f)
            spec_pts.append((slots, d["continuous_agg_tok_s"]))
    if len(pts) >= 3:
        fig, ax = plt.subplots()
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        ax.plot(xs, ys, marker="o", markersize=5, color=COLOR_KV,
                label="plain")
        for x, y, r in pts:
            ax.text(x, y + 20, f"{y:.0f}\n(r{r})", ha="center", fontsize=7)
        if len(spec_pts) >= 2:
            ax.plot([p[0] for p in spec_pts], [p[1] for p in spec_pts],
                    marker="s", markersize=5, color=COLOR_SINGLE,
                    linestyle="--", label="speculative k=4 (r3)")
        # Round-4 shipped config at the same width: adaptive spec k=8 at
        # cadence 16 + kv window + packed host pipeline (server defaults).
        r4_path = os.path.join(
            args.serving_dir,
            "continuous_bench_int8_s32c32_r256_specL8av16_kvw.json")
        if os.path.exists(r4_path):
            with open(r4_path) as f:
                d = json.load(f)
            y = d["continuous_agg_tok_s"]
            ax.plot([32], [y], marker="*", markersize=14, color="#7a2048",
                    linestyle="none",
                    label="r4 shipped: spec k=8 + window + pipeline")
            ax.text(32, y + 30, f"{y:.0f}", ha="center", fontsize=8,
                    color="#7a2048")
        ax.legend(frameon=False, fontsize=8)
        ax.set_xlabel("Decode slots (int8, chunk 32; rN = backlog size)")
        ax.set_ylabel("Useful tokens/sec (aggregate)")
        ax.set_title("Continuous Serving Width Scaling")
        ax.grid(True, alpha=0.3)
        ax.set_ylim(bottom=0)
        fig.tight_layout()
        save(fig, "fig7_serving_width")

    # fig8: n-gram speculative decode (single stream) vs plain chunked
    # greedy, with measured acceptance annotated.
    spec_path = os.path.join(args.serving_dir, "spec_bench_int8.json")
    if os.path.exists(spec_path):
        with open(spec_path) as f:
            d = json.load(f)
        ks = sorted(int(k.split("_k")[1].split("_")[0])
                    for k in d if k.startswith("spec_k") and k.endswith("ms_per_tok"))
        if ks:
            fig, ax = plt.subplots()
            labels = ["plain"] + [f"k={k}" for k in ks]
            vals = [d["plain_ms_per_tok"]] + [d[f"spec_k{k}_ms_per_tok"] for k in ks]
            colors = [COLOR_NOKV] + [COLOR_KV] * len(ks)
            ax.bar(labels, vals, color=colors)
            for i, v in enumerate(vals):
                ax.text(i, v, f"{v:.2f}", ha="center", va="bottom", fontsize=8)
            for i, k in enumerate(ks):
                acc = d.get(f"spec_k{k}_tokens_per_verify")
                if acc:
                    ax.text(i + 1, vals[i + 1] / 2, f"{acc:.1f}\ntok/vfy",
                            ha="center", fontsize=7, color="white")
            ax.set_ylabel("ms / token (int8, greedy)")
            ax.set_title("Speculative Decoding (n-gram drafts)")
            ax.grid(True, alpha=0.3, axis="y")
            fig.tight_layout()
            save(fig, "fig8_speculative")

    # fig9: serving throughput vs speculative acceptance (round-4 noise
    # sweep + the clean workload): the measured degradation curve behind
    # the flat-2.0 break-even policy. Acceptance is moved on-device with
    # --draft_noise (drafts corrupted, verification rejects — streams stay
    # exact), so every point is the SAME engine/config, only acceptance
    # differs.
    acc_files = [
        "continuous_bench_int8_s32c32_r256_specL8av16_dn90_kvw.json",
        "continuous_bench_int8_s32c32_r256_specL8av16_dn60_kvw.json",
        "continuous_bench_int8_s32c32_r256_specL8av16_dn30_kvw.json",
        "continuous_bench_int8_s32c32_r256_specL8av16_kvw.json",
    ]
    acc_pts = []
    for fname in acc_files:
        path = os.path.join(args.serving_dir, fname)
        if os.path.exists(path):
            with open(path) as f:
                d = json.load(f)
            if d.get("spec_tokens_per_verify"):
                acc_pts.append(
                    (d["spec_tokens_per_verify"], d["continuous_agg_tok_s"]))
    plain_path = os.path.join(
        args.serving_dir, "continuous_bench_int8_s32c32_r256.json")
    if len(acc_pts) >= 3:
        fig, ax = plt.subplots()
        acc_pts.sort()
        ax.plot([p[0] for p in acc_pts], [p[1] for p in acc_pts],
                marker="o", markersize=5, color=COLOR_KV,
                label="adaptive spec k=8 (std workload)")
        for x, y in acc_pts:
            ax.text(x, y + 60, f"{y:.0f}", ha="center", fontsize=7)
        if os.path.exists(plain_path):
            with open(plain_path) as f:
                plain = json.load(f)["continuous_agg_tok_s"]
            ax.axhline(plain, color=COLOR_NOKV, linestyle="--", linewidth=1,
                       label=f"plain engine ({plain:.0f})")
        ax.set_xlabel("Acceptance (emitted tokens / verify step)")
        ax.set_ylabel("Useful tokens/sec (aggregate)")
        ax.set_title("Serving Throughput vs Speculative Acceptance")
        ax.legend(frameon=False, fontsize=8)
        ax.grid(True, alpha=0.3)
        fig.tight_layout()
        save(fig, "fig9_acceptance")

    # fig10: the round-4 shipped-config story — std/long workloads x
    # {plain engine, shipped defaults (adaptive spec k=8 + kv window +
    # packed host pipeline), shipped + opt-in a8 prefill}.
    band_spec = {
        "std\n(256 req, 16-128)": [
            ("plain", "continuous_bench_int8_s32c32_r256.json"),
            ("shipped", "continuous_bench_int8_s32c32_r256_specL8av16_kvw.json"),
            ("+a8", "continuous_bench_int8_s32c32_r256_specL8av16_a8_kvw.json"),
        ],
        "long\n(96 req, 64-512)": [
            ("plain", "continuous_bench_int8_s32c32_r96_long.json"),
            ("shipped", "continuous_bench_int8_s32c32_r96_specL8av16_kvw_long.json"),
            ("+a8", "continuous_bench_int8_s32c32_r96_specL8av16_a8_kvw_long.json"),
        ],
    }
    series = {}
    for wl, entries in band_spec.items():
        for cfg_label, fname in entries:
            path = os.path.join(args.serving_dir, fname)
            if os.path.exists(path):
                with open(path) as f:
                    series.setdefault(cfg_label, {})[wl] = json.load(f)[
                        "continuous_agg_tok_s"]
    if len(series) >= 2:
        fig, ax = plt.subplots()
        wls = list(band_spec)
        xs = np.arange(len(wls))
        n = len(series)
        w = 0.8 / n
        colors = [COLOR_NOKV, COLOR_KV, "#7a2048"]
        for i, (cfg_label, vals) in enumerate(series.items()):
            off = (i - (n - 1) / 2) * w
            ys = [vals.get(wl, 0) for wl in wls]
            ax.bar(xs + off, ys, w, label=cfg_label, color=colors[i % 3])
            for x, y in zip(xs + off, ys):
                if y:
                    ax.text(x, y, f"{y:.0f}", ha="center", va="bottom",
                            fontsize=7)
        ax.set_xticks(xs)
        ax.set_xticklabels(wls, fontsize=9)
        ax.set_ylabel("Useful tokens/sec (aggregate)")
        ax.set_title("Shipped Serving Config by Workload (int8, 32 slots)")
        ax.legend(frameon=False, fontsize=8)
        ax.grid(True, alpha=0.3, axis="y")
        fig.tight_layout()
        save(fig, "fig10_serving_configs")

    print("\nResults summary:")
    print(f"  - Speedup range: {speedup.min():.1f}x to {speedup.max():.1f}x")
    kv_ms = np.asarray(data["kv_ms"], dtype=float)
    no_kv_ms = np.asarray(data["no_kv_ms"], dtype=float)
    print(f"  - KV-cache latency: {kv_ms.mean():.1f}ms (±{kv_ms.std():.1f}ms)")
    print(f"  - No-cache latency: {no_kv_ms.mean():.1f}ms (±{no_kv_ms.std():.1f}ms)")


if __name__ == "__main__":
    main()
