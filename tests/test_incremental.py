"""Incremental ingest: seen-skip idempotence, new-dup-of-old lands in the
existing cluster, batch+increment ≡ full-corpus run (cluster equivalence)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedup.config import DedupConfig
from dedup.fixtures import gen_transcripts
from dedup.incremental import merge_new_conversations
from dedup.pipeline import run_pipeline


def test_incremental_merge(spark, tmp_path):
    cfg = DedupConfig(shuffle_partitions=8)
    full = gen_transcripts(spark, 120, seed=21, partitions=4, edge_rows=False)
    # split: conversations c000000{00..79} first, rest arrive later
    first = full.filter(F.col("conv_id") < "c00000080")
    second = full  # includes already-seen convs → must be skipped idempotently

    run_dir = str(tmp_path / "runs")
    run_pipeline(spark, first, cfg, run_dir, "base")

    out = merge_new_conversations(
        spark, second, run_dir, "base", cfg, run_dir, "incr"
    )
    merged = {r["conv_id"]: r["cluster_id"] for r in out["clusters"].collect()}

    # idempotence: previously-seen convs were not re-processed
    assert out["new_docs"].filter(F.col("conv_id") < "c00000080").count() == 0
    # coverage: every conversation has an assignment
    assert len(merged) == 120

    # equivalence to a one-shot run over the full corpus (same config)
    ref = run_pipeline(spark, full, cfg, run_dir, "oneshot")
    ref_clusters = {r["conv_id"]: r["cluster_id"] for r in ref["clusters"].collect()}

    def canon(assign):
        groups = {}
        for c, k in assign.items():
            groups.setdefault(k, set()).add(c)
        return {frozenset(v) for v in groups.values()}

    assert canon(merged) == canon(ref_clusters)


def test_incremental_refuses_config_change(spark, tmp_path):
    cfg = DedupConfig(shuffle_partitions=8)
    turns = gen_transcripts(spark, 30, seed=22, partitions=2, edge_rows=False)
    run_dir = str(tmp_path / "runs")
    run_pipeline(spark, turns, cfg, run_dir, "base")
    with pytest.raises(ValueError, match="config-bound"):
        merge_new_conversations(
            spark, turns, run_dir, "base", cfg.with_(k_shingle=4), run_dir, "incr"
        )
