"""Metrics rollups + recall evaluation (SURVEY.md §2.4 A5, §2.7 U3).

Per-stage metrics/lineage live in state.py; this module holds the
aggregate diagnostics and the recall gate used by tests and bench.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cluster_summary(clusters: DataFrame) -> DataFrame:
    """(conv_id, cluster_id) -> one summary row."""
    sizes = clusters.groupBy("cluster_id").agg(F.count("*").alias("size"))
    return sizes.agg(
        F.count("*").alias("n_clusters"),
        F.sum("size").alias("n_convs"),
        F.sum(F.when(F.col("size") > 1, F.col("size")).otherwise(0)).alias(
            "n_convs_in_dup_clusters"
        ),
        F.max("size").alias("max_cluster"),
        F.expr("approx_percentile(size, 0.99)").alias("p99_cluster"),
    )


def top_clusters(clusters: DataFrame, k: int = 20) -> DataFrame:
    return (
        clusters.groupBy("cluster_id")
        .agg(F.count("*").alias("size"))
        .orderBy(F.desc("size"), "cluster_id")
        .limit(k)
    )


def corpus_stats(docs: DataFrame, seed: int = 42) -> DataFrame:
    """Cheap corpus diagnostics (§2.4 A8, §2.6 O3): approximate distinct
    text cardinality on a seeded sample — constant-memory at any scale."""
    sample = docs.sample(fraction=0.1, seed=seed)
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.approx_count_distinct("norm_text").alias("approx_distinct_texts"),
        F.avg("n_turns").alias("avg_turns"),
    ).crossJoin(
        sample.agg(F.avg("n_chars").alias("sampled_avg_chars"))
    )


def pair_recall(predicted: DataFrame, truth: DataFrame) -> float:
    """|predicted ∩ truth| / |truth| over canonical (a, b) pair keys."""
    t = truth.select("a", "b").distinct()
    total = t.count()
    if total == 0:
        return 1.0
    hit = t.join(predicted.select("a", "b").distinct(), ["a", "b"], "left_semi").count()
    return hit / total


def cluster_pair_recall(pred_clusters: DataFrame, truth_clusters: DataFrame) -> float:
    """Recall over *cluster-implied* pairs: fraction of truth same-cluster
    pairs that are also same-cluster in the prediction. This is the
    "matches the reference's cluster assignments" metric (BASELINE.json:14)
    evaluated pairwise, so it is invariant to cluster-id naming."""
    t = truth_clusters.alias("t1").join(
        truth_clusters.alias("t2"),
        (F.col("t1.cluster_id") == F.col("t2.cluster_id"))
        & (F.col("t1.conv_id") < F.col("t2.conv_id")),
    ).select(F.col("t1.conv_id").alias("a"), F.col("t2.conv_id").alias("b"))
    p = pred_clusters.alias("p1").join(
        pred_clusters.alias("p2"),
        (F.col("p1.cluster_id") == F.col("p2.cluster_id"))
        & (F.col("p1.conv_id") < F.col("p2.conv_id")),
    ).select(F.col("p1.conv_id").alias("a"), F.col("p2.conv_id").alias("b"))
    return pair_recall(p, t)
