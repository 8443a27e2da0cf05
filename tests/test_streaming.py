"""Structured Streaming ingest tests: multi-micro-batch drain, cross-run
incremental chaining via the promoted state, and exact equivalence with the
one-shot batch pipeline over the full corpus."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from dedup.config import DedupConfig
from dedup.fixtures import gen_transcripts
from dedup.pipeline import run_pipeline
from dedup.streaming import current_clusters, current_state, stream_dedup


def _clusters_canonical(df):
    """Cluster structure as a set of frozensets (cluster ids themselves may
    differ — the min rule can rename when ingestion order differs)."""
    rows = df.collect()
    by_cluster: dict[str, set] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["conv_id"])
    return {frozenset(v) for v in by_cluster.values()}


def test_stream_matches_one_shot_pipeline(spark):
    cfg = DedupConfig(shuffle_partitions=8)
    full = gen_transcripts(spark, 240, seed=11, partitions=4).localCheckpoint()
    # conv-disjoint halves; dup families intentionally straddle the split
    half_a = full.filter(F.crc32(F.col("conv_id")) % 2 == 0)
    half_b = full.filter(F.crc32(F.col("conv_id")) % 2 == 1)

    tmp = tempfile.mkdtemp(prefix="stream_in_")
    stream_dir = tempfile.mkdtemp(prefix="stream_state_")

    # drain 1: only half A exists; small trigger forces >1 micro-batch so
    # bootstrap + incremental chaining both run inside one drain
    # partition BY conv_id: the input contract requires whole
    # conversations per file (streaming assigns whole files to batches)
    half_a.repartition(4, "conv_id").write.mode("append").parquet(tmp)
    stream_dedup(spark, tmp, stream_dir, cfg, max_files_per_trigger=2)
    cur1 = current_state(stream_dir)
    assert cur1 is not None and cur1["batch_id"] >= 1  # >= 2 micro-batches
    n_a = current_clusters(spark, stream_dir).count()
    assert n_a == half_a.select("conv_id").distinct().count()

    # drain 2: half B arrives as new files; checkpoint skips the old ones
    half_b.repartition(3, "conv_id").write.mode("append").parquet(tmp)
    stream_dedup(spark, tmp, stream_dir, cfg, max_files_per_trigger=2)
    streamed = current_clusters(spark, stream_dir)

    ref = run_pipeline(
        spark, full, cfg, tempfile.mkdtemp(prefix="stream_ref_"), "oneshot"
    )["clusters"]
    assert _clusters_canonical(streamed) == _clusters_canonical(ref)


def test_stream_idempotent_redelivery(spark):
    """Re-delivering already-seen conversations (duplicate files) must not
    change the clustering — the reference's per-event 'seen' semantics."""
    cfg = DedupConfig(shuffle_partitions=8)
    corpus = gen_transcripts(spark, 120, seed=5, partitions=3).localCheckpoint()
    tmp = tempfile.mkdtemp(prefix="stream_in2_")
    stream_dir = tempfile.mkdtemp(prefix="stream_state2_")

    corpus.write.mode("append").parquet(tmp)
    stream_dedup(spark, tmp, stream_dir, cfg)
    before = _clusters_canonical(current_clusters(spark, stream_dir))

    corpus.repartition(2, "conv_id").write.mode("append").parquet(tmp)  # same convs again
    stream_dedup(spark, tmp, stream_dir, cfg)
    after = _clusters_canonical(current_clusters(spark, stream_dir))
    assert before == after
