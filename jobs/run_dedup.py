"""Cluster entry point (SURVEY.md §3.1, §3.3).

  spark-submit --py-files dedup.zip jobs/run_dedup.py \
      --input <iceberg table | parquet path> \
      --run-dir <state/output dir> [--run-id RUN] [--resume] \
      [--num-perm 128] [--bands 32] [--k-shingle 3] ...

On a cluster, pass the Iceberg runtime via --packages
org.apache.iceberg:iceberg-spark-runtime-4.1 and a catalog config; in this
sandbox the parquet fallback applies (io.py). Resume: rerunning with the
same --run-dir/--run-id skips completed stages (state.py manifests) iff the
config fingerprint matches; input is pinned to the recorded Iceberg
snapshot id when available.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="PySpark near-dup detection + clustering")
    p.add_argument("--input", required=True, help="Iceberg table name or parquet path")
    p.add_argument("--run-dir", required=True)
    p.add_argument("--run-id", default=None, help="default: derived from config+input")
    p.add_argument("--resume", action="store_true", help="reuse completed stages")
    p.add_argument(
        "--fast",
        action="store_true",
        help="localCheckpoint stages instead of writing them (≈2x faster; "
        "forfeits resume + lineage — for one-shot/CI runs)",
    )
    p.add_argument(
        "--tiers",
        action="store_true",
        help="also emit per-conversation dedup-tier verdicts "
        "(exact > near > substring > unique) to <run-dir>/<run-id>/tiers "
        "and a per-tier rollup in the summary JSON",
    )
    p.add_argument("--k-shingle", type=int, default=3)
    p.add_argument("--num-perm", type=int, default=128)
    p.add_argument("--bands", type=int, default=32)
    p.add_argument("--hamming-d", type=int, default=3)
    p.add_argument("--jaccard-threshold", type=float, default=0.8)
    p.add_argument("--bucket-cap", type=int, default=64)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv)
    from dedup.config import DedupConfig
    from dedup.io import current_snapshot_id, read_transcripts
    from dedup.metrics import cluster_summary
    from dedup.pipeline import run_pipeline
    from dedup.session import build_session

    kw = dict(
        k_shingle=args.k_shingle,
        num_perm=args.num_perm,
        lsh_bands=args.bands,
        hamming_d=args.hamming_d,
        jaccard_threshold=args.jaccard_threshold,
        bucket_cap=args.bucket_cap,
        seed=args.seed,
    )
    if args.shuffle_partitions:
        kw["shuffle_partitions"] = args.shuffle_partitions
    config = DedupConfig(**kw)

    if args.fast and args.resume:
        print("error: --fast forfeits stage state; it cannot be combined with --resume", file=sys.stderr)
        return 2

    spark = build_session(app_name="run_dedup", config=config)
    run_id = args.run_id or f"r_{config.fingerprint[:8]}"
    if not args.resume and not args.fast:
        # refuse accidental overwrite of a previous run's state
        import os

        if os.path.exists(f"{args.run_dir}/{run_id}/clusters.manifest.json"):
            print(
                f"run {run_id} already complete in {args.run_dir}; "
                "pass --resume to reuse or choose a new --run-id",
                file=sys.stderr,
            )
            return 2

    if "/" in args.input:
        import os

        if not os.path.exists(args.input):
            print(f"error: input path does not exist: {args.input}", file=sys.stderr)
            return 2

    snapshot_id = current_snapshot_id(spark, args.input)
    turns = read_transcripts(spark, args.input, snapshot_id=snapshot_id)

    t0 = time.monotonic()
    out = run_pipeline(
        spark,
        turns,
        config,
        args.run_dir,
        run_id,
        mode="persist" if args.fast else "parquet",
    )
    wall = time.monotonic() - t0
    summary = cluster_summary(out["clusters"]).head().asDict()
    extra: dict = {}
    if args.tiers:
        from dedup.tiers import tier_assignments, tier_summary

        tiers = tier_assignments(out["docs"], out["exact_groups"], out["verified"])
        tiers.write.mode("overwrite").parquet(f"{args.run_dir}/{run_id}/tiers")
        extra["tiers"] = {
            r["tier"]: int(r["n_convs"])
            for r in tier_summary(
                spark.read.parquet(f"{args.run_dir}/{run_id}/tiers")
            ).collect()
        }
    print(
        json.dumps(
            {
                "run_id": run_id,
                "config_fp": config.fingerprint,
                "snapshot_id": snapshot_id,
                "wall_sec": round(wall, 2),
                **{k: int(v) for k, v in summary.items()},
                **extra,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
