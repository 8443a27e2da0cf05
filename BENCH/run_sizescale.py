"""Corpus-size scaling study: does pinned 2-vs-8-core efficiency rise
with corpus size?

Motivation (BENCH/BASELINE.md "Analysis of the pinned headline"): the
pinned 2v8 pairs at the 200k-conv corpus landed below the >=0.8 line
(0.789/0.658/0.822/0.755), with the hypothesis that per-run fixed
overhead (~20s of job scheduling + stage materialization) is a larger
share of the 8-core wall (~50s) than the 2-core wall (~140s) at that
corpus size — a small-input artifact, not an engine scaling defect.
The prediction that matters for the 10^12-turn target is that the
paired ratio RISES as the corpus grows and fixed overhead amortizes.

This harness tests exactly that: taskset-pinned 2-core and 8-core runs
of the identical job over three corpus sizes (200k/400k/800k convs,
i.e. 2.2M/4.4M/8.8M turns), INTERLEAVED size-by-size within each rep so
all sizes sample the same slice of host-grant drift. Results stream to
stdout as JSONL; the summary table goes to --out.

Usage: python BENCH/run_sizescale.py [--reps 3] [--sizes 200000,400000,800000]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from run_scaling import effective_cores, run_once  # noqa: E402

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sizes", default="200000,400000,800000")
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=str(Path(__file__).parent / "SIZESCALE.md"))
    args = ap.parse_args()

    sizes = [int(s) for s in args.sizes.split(",")]
    ratio = args.high / args.low

    # warm-up per size (excluded): builds the cached corpus + fs caches
    for n in sizes:
        os.environ["SPARK_GRAFT_BENCH_CONVS"] = str(n)
        r = run_once(args.high, args.sf_dir, pin_cores=True)
        print(json.dumps({"warmup": True, "convs": n, **r}), flush=True)

    pairs: dict[int, list[tuple[dict, dict]]] = {n: [] for n in sizes}
    for rep in range(args.reps):
        for n in sizes:
            os.environ["SPARK_GRAFT_BENCH_CONVS"] = str(n)
            probe = effective_cores()
            lo = run_once(args.low, args.sf_dir, pin_cores=True)
            hi = run_once(args.high, args.sf_dir, pin_cores=True)
            lo["effective_cores_probe"] = hi["effective_cores_probe"] = probe
            pairs[n].append((lo, hi))
            eff = (lo["value"] / hi["value"]) / ratio
            print(
                json.dumps(
                    {
                        "rep": rep,
                        "convs": n,
                        "turns": hi.get("turns"),
                        f"wall_local[{args.low}]": lo["value"],
                        f"wall_local[{args.high}]": hi["value"],
                        "paired_efficiency": round(eff, 3),
                        "cpu_low": lo.get("pipeline_cpu_sec"),
                        "cpu_high": hi.get("pipeline_cpu_sec"),
                        "probe": probe,
                    }
                ),
                flush=True,
            )

    lines = [
        f"# pinned {args.low}v{args.high} efficiency vs corpus size",
        "",
        f"Identical job, taskset-pinned {args.low} vs {args.high} cores,"
        " sizes interleaved",
        f"within each of {args.reps} reps (all sizes see the same host-grant",
        f"drift). Paired efficiency = (wall_{args.low} / wall_{args.high})"
        f" / {ratio:g}.",
        "",
        f"| convs | turns | median wall {args.low}c | median wall"
        f" {args.high}c | paired efficiencies | median eff |",
        "|---|---|---|---|---|---|",
    ]
    for n in sizes:
        effs = [
            round((lo["value"] / hi["value"]) / ratio, 3) for lo, hi in pairs[n]
        ]
        w2 = statistics.median(lo["value"] for lo, _ in pairs[n])
        w8 = statistics.median(hi["value"] for _, hi in pairs[n])
        turns = pairs[n][0][1].get("turns", "?")
        lines.append(
            f"| {n} | {turns} | {w2:.1f}s | {w8:.1f}s | "
            f"{', '.join(f'{e:.3f}' for e in effs)} | "
            f"**{statistics.median(effs):.3f}** |"
        )
    lines += [
        "",
        "Raw per-run results:",
        "",
        "```json",
        *[
            json.dumps(
                {
                    "convs": n,
                    "cpus": c,
                    **{
                        k: r[k]
                        for k in (
                            "value",
                            "turns_per_sec",
                            "pipeline_cpu_sec",
                            "effective_cores_probe",
                        )
                        if k in r
                    },
                }
            )
            for n in sizes
            for lo, hi in pairs[n]
            for c, r in ((args.low, lo), (args.high, hi))
        ],
        "```",
        "",
    ]
    Path(args.out).write_text("\n".join(lines))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
