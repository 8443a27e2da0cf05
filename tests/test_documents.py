"""Recall gate on the driver's `documents` table (sf0.001): the table has
planted near-duplicates (BASELINE.md measured: 3-word-shingle Jaccard
0.973–0.988); the pipeline must recover >= 0.99 of the brute-force oracle's
dup pairs at the same config."""

from __future__ import annotations

import os

import pytest

from dedup.config import DedupConfig
from dedup.io import documents_as_transcripts
from dedup.metrics import cluster_pair_recall
from dedup.pipeline import run_pipeline

from .oracle import truth_for_texts

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.exists(SF_DIR), reason="driver testdata absent")
def test_documents_recall(spark, tmp_path):
    cfg = DedupConfig(shuffle_partitions=8)
    turns = documents_as_transcripts(spark, SF_DIR)
    out = run_pipeline(spark, turns, cfg, str(tmp_path / "docs"), "docs")
    texts = {
        r["conv_id"]: r["norm_text"]
        for r in out["docs"].select("conv_id", "norm_text").collect()
    }
    truth_pairs, truth_clusters = truth_for_texts(
        texts, cfg.k_shingle, cfg.jaccard_threshold
    )
    assert truth_pairs, "fixture expectation: documents table has planted near-dups"
    truth_df = spark.createDataFrame(
        list(truth_clusters.items()), "conv_id string, cluster_id string"
    )
    recall = cluster_pair_recall(out["clusters"], truth_df)
    assert recall >= 0.99, f"documents dup-pair recall {recall} < 0.99"
