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


def run_once(cpus: int, sf_dir: str, pin_cores: bool = False) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_HEADLINE_ONLY="1",
        # identical job at both levels: partitions sized for the high level
        SPARK_GRAFT_SHUFFLE_PARTITIONS=os.environ.get(
            "SPARK_GRAFT_SHUFFLE_PARTITIONS", "16"
        ),
        # scaling evidence needs a compute-dominated run: per-stage fixed
        # overhead (~20s of job scheduling + materialization) must be small
        # against parallel work, or N-vs-4N measures overhead, not scaling
        SPARK_GRAFT_BENCH_CONVS=os.environ.get("SPARK_GRAFT_BENCH_CONVS", "100000"),
    )
    # --pin-cores: bound the whole process tree (JVM, GC/JIT threads, Python
    # UDF workers) to exactly `cpus` host CPUs via taskset, so "local[N]" is
    # literally an N-core executor. Without pinning, a local[1] run on an
    # idle host rides ~1.2-1.3 delivered cores of free auxiliary-thread
    # parallelism, deflating the measured N-vs-4N wall ratio (it compares a
    # 1.25-core baseline against a 4.3-core run, not 1 against 4). Affinity
    # is inherited by every forked/exec'd child. CPUs are spread across the
    # host's cache domains (stride) rather than packed.
    argv = [sys.executable, str(REPO / "bench.py")]
    if pin_cores:
        stride = max(1, (os.cpu_count() or cpus) // cpus)
        cpu_list = ",".join(str(i * stride) for i in range(cpus))
        argv = ["taskset", "-c", cpu_list] + argv
    out = subprocess.run(
        argv,
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
    ap.add_argument(
        "--pin-cores",
        action="store_true",
        help="taskset-pin each run's whole process tree to exactly N host "
        "CPUs, making the N-vs-4N core ratio literal",
    )
    ap.add_argument("--out", default=str(Path(__file__).parent / "BASELINE.md"))
    args = ap.parse_args()

    results: dict[int, list[dict]] = {args.low: [], args.high: []}
    # warm-up run (excluded): builds the cached bench corpus + JIT-independent
    # filesystem caches
    run_once(args.high, args.sf_dir, args.pin_cores)
    for rep in range(args.reps):
        for cpus in (args.low, args.high):
            avail = effective_cores()
            r = run_once(cpus, args.sf_dir, args.pin_cores)
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
    ratio = args.high / args.low
    # Headline estimator: median of per-rep paired ratios. The host's grant
    # drifts minute-to-minute (identical local[4] runs measured 70s and 283s
    # in one session), so the two runs of a rep — executed back-to-back —
    # see far more correlated host state than runs from different reps;
    # the cross-rep median-of-medians both under- and over-shot (paired
    # ratios 0.18/0.66/1.04 in the same 3-rep session).
    pair_effs = [
        (lo["value"] / hi["value"]) / ratio
        for lo, hi in zip(results[args.low], results[args.high])
    ]
    eff = statistics.median(pair_effs)
    speedup = t_low / t_high
    turns = results[args.high][0]["turns"]

    summary = {
        "sf_dir": args.sf_dir,
        "turns": turns,
        "reps": args.reps,
        "pin_cores": args.pin_cores,
        f"median_sec_local[{args.low}]": round(t_low, 2),
        f"median_sec_local[{args.high}]": round(t_high, 2),
        f"turns_per_sec_local[{args.low}]": tp_low,
        f"turns_per_sec_local[{args.high}]": tp_high,
        "speedup_of_medians": round(speedup, 3),
        "paired_efficiencies": [round(e, 3) for e in pair_effs],
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(summary))
    md = Path(args.out)
    pin_line = (
        "Runs are taskset-pinned: each run's whole process tree (JVM + GC/JIT\n"
        "threads + Python workers) is bound to exactly N host CPUs, so the\n"
        "N-vs-4N core ratio is literal.\n\n"
        if args.pin_cores
        else ""
    )
    md.write_text(
        "# BENCH/BASELINE.md — scaling-efficiency evidence\n\n"
        "Adaptation of the N vs 4N executor criterion (BASELINE.json:2,14) per the\n"
        "task brief: identical job + input at two parallelism levels, fresh JVM per\n"
        f"run, {args.reps} repetitions, warm-up excluded. Headline = median of\n"
        "per-rep paired ratios (each rep's two runs execute back-to-back, so they\n"
        "see correlated host-grant state; the grant drifts 2-4x across minutes —\n"
        "see the per-rep probe values below and BENCH/NOTES.md).\n\n" + pin_line +
        f"- input: `{args.sf_dir}` synthetic transcript corpus, **{turns} turns**\n"
        f"- `local[{args.low}]`: median {t_low:.2f}s ({tp_low:.0f} turns/s)\n"
        f"- `local[{args.high}]`: median {t_high:.2f}s ({tp_high:.0f} turns/s)\n"
        f"- per-rep paired efficiencies: {', '.join(f'{e:.3f}' for e in pair_effs)}\n"
        f"- **scaling efficiency {eff:.3f}** (median of paired ratios over a "
        f"{ratio:.0f}× core ratio; {'meets' if eff >= 0.8 else 'BELOW'} the ≥0.8 target)\n\n"
        f"Raw per-rep results:\n\n```json\n"
        + "\n".join(
            json.dumps({"cpus": c, **{k: r[k] for k in ('value', 'turns_per_sec', 'pipeline_cpu_sec', 'effective_cores_probe') if k in r}})
            for c in (args.low, args.high)
            for r in results[c]
        )
        + "\n```\n"
    )
    print(f"wrote {md}")


if __name__ == "__main__":
    main()
