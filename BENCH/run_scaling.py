"""Scaling-efficiency evidence (BASELINE.json:2,14 adapted per task brief):
the N vs 4N *executor* criterion is evidenced by running the identical
dedup job on the same input at local[8] and local[32] (this sandbox has no
real cluster), reporting throughput at both plus efficiency = speedup / 4.

Each measurement is a fresh subprocess (own JVM — no warm-JIT bleed),
>= `--reps` repetitions, medians reported. Results → BENCH/BASELINE.md.

Usage: python BENCH/run_scaling.py [--reps 3] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


_BURN_SECS = 0.5


def _burn(_):
    import time

    t0 = time.time()
    x = 0
    while time.time() - t0 < _BURN_SECS:
        x += 1
    return x


def effective_cores(n: int = 16) -> float:
    """Probe how many cores the (time-shared) host actually grants right
    now — recorded per rep so scaling numbers are interpretable."""
    import multiprocessing as mp
    import time

    t0 = time.time()
    with mp.Pool(n) as p:
        res = p.map(_burn, range(n))
    wall = time.time() - t0
    return round(sum(res) / max(res) / (wall / _BURN_SECS), 1)


def run_once(cpus: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_HEADLINE_ONLY="1",
        # scaling evidence needs a compute-dominated run: per-stage fixed
        # overhead (~20s of job scheduling + materialization) must be small
        # against parallel work, or N-vs-4N measures overhead, not scaling
        SPARK_GRAFT_BENCH_CONVS=os.environ.get("SPARK_GRAFT_BENCH_CONVS", "100000"),
    )
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=str(REPO),
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    # N vs 4N. Default 2 vs 8: the sandbox host time-shares CPU and rarely
    # grants more than ~8-16 effective cores, so 8-vs-32 measures
    # oversubscription, not scaling.
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    args = ap.parse_args()

    results: dict[int, list[dict]] = {args.low: [], args.high: []}
    # warm-up run (excluded): builds the cached bench corpus + JIT-independent
    # filesystem caches
    run_once(args.high, args.sf_dir)
    for rep in range(args.reps):
        for cpus in (args.low, args.high):
            avail = effective_cores()
            r = run_once(cpus, args.sf_dir)
            r["effective_cores_probe"] = avail
            results[cpus].append(r)
            print(
                f"rep {rep} cpus {cpus}: {r['value']}s "
                f"({r['turns_per_sec']} turns/s; host granting ~{avail} cores)",
                flush=True,
            )

    def med(cpus: int, key: str) -> float:
        return statistics.median(x[key] for x in results[cpus])

    t_low, t_high = med(args.low, "value"), med(args.high, "value")
    tp_low, tp_high = med(args.low, "turns_per_sec"), med(args.high, "turns_per_sec")
    speedup = t_low / t_high
    ratio = args.high / args.low
    eff = speedup / ratio
    turns = results[args.high][0]["turns"]

    summary = {
        "sf_dir": args.sf_dir,
        "turns": turns,
        "reps": args.reps,
        f"median_sec_local[{args.low}]": round(t_low, 2),
        f"median_sec_local[{args.high}]": round(t_high, 2),
        f"turns_per_sec_local[{args.low}]": tp_low,
        f"turns_per_sec_local[{args.high}]": tp_high,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(summary))
    md = Path(__file__).parent / "BASELINE.md"
    md.write_text(
        "# BENCH/BASELINE.md — scaling-efficiency evidence\n\n"
        "Adaptation of the N vs 4N executor criterion (BASELINE.json:2,14) per the\n"
        "task brief: identical job + input at two parallelism levels, fresh JVM per\n"
        f"run, medians of {args.reps} repetitions, warm-up excluded.\n\n"
        f"- input: `{args.sf_dir}` synthetic transcript corpus, **{turns} turns**\n"
        f"- `local[{args.low}]`: median {t_low:.2f}s ({tp_low:.0f} turns/s)\n"
        f"- `local[{args.high}]`: median {t_high:.2f}s ({tp_high:.0f} turns/s)\n"
        f"- speedup {args.low}→{args.high} cores: **{speedup:.2f}×** over a {ratio:.0f}× "
        f"core ratio → **scaling efficiency {eff:.3f}** "
        f"({'meets' if eff >= 0.8 else 'BELOW'} the ≥0.8 target)\n\n"
        f"Raw per-rep results:\n\n```json\n"
        + "\n".join(
            json.dumps({"cpus": c, **{k: r[k] for k in ('value', 'turns_per_sec', 'effective_cores_probe')}})
            for c in (args.low, args.high)
            for r in results[c]
        )
        + "\n```\n"
    )
    print(f"wrote {md}")


if __name__ == "__main__":
    main()
