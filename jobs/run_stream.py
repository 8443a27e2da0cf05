"""Streaming cluster entry point (SURVEY.md §2.9 + §3.1 applied to
Structured Streaming; the drain-loop counterpart of jobs/run_dedup.py).

  spark-submit --py-files dedup.zip jobs/run_stream.py \
      --input <transcript parquet dir> --stream-dir <state dir> \
      [--auto-compact] [--gc] [--max-files-per-trigger N] [--num-perm 128] ...

Each invocation drains everything currently in --input that the streaming
checkpoint hasn't seen (trigger availableNow), promotes O(batch) state
deltas, optionally auto-compacts conversations that grew since an earlier
drain, and prints one JSON summary line. Re-invoke on a schedule for
continuous operation; state and checkpoint both live under --stream-dir,
so a crashed drain resumes exactly (idempotent redelivery is a no-op).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        description="Streaming near-dup clustering over a growing transcript dir"
    )
    p.add_argument("--input", required=True, help="transcript parquet directory")
    p.add_argument("--stream-dir", required=True, help="state + checkpoint dir")
    p.add_argument(
        "--auto-compact",
        action="store_true",
        help="after the drain, re-cluster conversations whose turns were "
        "skipped as already-seen and actually grew (scoped content-hash "
        "probe; no input scan when nothing was skipped)",
    )
    p.add_argument(
        "--gc",
        action="store_true",
        help="after the drain (quiescent state), delete part directories "
        "no longer referenced by the manifest — folding/promotion never "
        "delete superseded parts themselves, so long-lived streams leak "
        "disk without an occasional gc pass; bytes freed appear in the "
        "JSON summary",
    )
    p.add_argument("--max-files-per-trigger", type=int, default=None)
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
    import os

    from dedup.config import DedupConfig
    from dedup.session import build_session
    from dedup.streaming import current_clusters, current_state, stream_dedup

    if not os.path.exists(args.input):
        print(f"error: input path does not exist: {args.input}", file=sys.stderr)
        return 2

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

    # cluster state is config-bound; the manifest records the bootstrap
    # fingerprint and process_batch refuses a mismatch mid-drain — fail
    # fast here with a readable message instead of a wrapped
    # StreamingQueryException
    try:
        prior = current_state(args.stream_dir)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    if prior is not None and prior["config_fp"] != config.fingerprint:
        print(
            f"error: stream state in {args.stream_dir} was built with "
            f"config {prior['config_fp']}; this invocation is "
            f"{config.fingerprint}. Cluster assignments are config-bound — "
            "use a new --stream-dir (or rerun with the original parameters).",
            file=sys.stderr,
        )
        return 2

    spark = build_session(app_name="run_stream", config=config)
    t0 = time.monotonic()
    stream_dedup(
        spark,
        args.input,
        args.stream_dir,
        config,
        max_files_per_trigger=args.max_files_per_trigger,
        auto_compact=args.auto_compact,
    )
    wall = time.monotonic() - t0
    gc_freed = None
    if args.gc:
        from dedup.streaming import gc_parts

        # the drain finished (awaitTermination above) and auto-compact ran
        # inside stream_dedup, so the state is quiescent — safe to drop
        # unreferenced part directories
        gc_freed = gc_parts(args.stream_dir) if current_state(
            args.stream_dir
        ) else 0
    state = current_state(args.stream_dir)
    if state is None:  # empty input dir: nothing drained, no state yet
        n_convs = n_clusters = 0
    else:
        clusters = current_clusters(spark, args.stream_dir)
        n_convs = clusters.count()
        n_clusters = clusters.select("cluster_id").distinct().count()
    print(
        json.dumps(
            {
                "stream_dir": args.stream_dir,
                "config_fp": config.fingerprint,
                "last_batch_id": state["batch_id"] if state else None,
                "wall_sec": round(wall, 2),
                "n_convs": n_convs,
                "n_clusters": n_clusters,
                "dirty_parts_pending": 0
                if args.auto_compact or state is None
                else len(state["parts"]["dirty"]),
                "gc_bytes_freed": gc_freed,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
