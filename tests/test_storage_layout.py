"""Storage-layout evidence: bucketed joins run with zero Exchange, and
date-partitioned reads prune directories (PartitionFilters). These are the
write-time layout levers the 100-TB deployment leans on (io.write_bucketed
/ io.write_partitioned docstrings); the assertions here pin the plans, not
just the results."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from dedup.io import write_bucketed, write_partitioned


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS layout LOCATION '/tmp/layout_db'")
    feats = spark.range(0, 2000).select(
        F.concat(F.lit("c"), F.col("id")).alias("conv_id"),
        (F.col("id") % 97).alias("sig"),
    )
    clusters = spark.range(0, 2000).select(
        F.concat(F.lit("c"), F.col("id")).alias("conv_id"),
        (F.col("id") % 13).alias("cluster_id"),
    )
    write_bucketed(feats, "layout.feats_b", ["conv_id"], 8, sort_cols=["conv_id"])
    write_bucketed(clusters, "layout.clusters_b", ["conv_id"], 8, sort_cols=["conv_id"])
    yield spark.table("layout.feats_b"), spark.table("layout.clusters_b")
    spark.sql("DROP TABLE IF EXISTS layout.feats_b")
    spark.sql("DROP TABLE IF EXISTS layout.clusters_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    feats, clusters = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast join so the bucket layout is what saves
        # the shuffle (at 100 TB neither side broadcasts anyway)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = feats.join(clusters, "conv_id")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    feats, _ = bucketed_tables
    agg = feats.groupBy("conv_id").agg(F.sum("sig").alias("s"))
    plan = _plan(agg)
    assert "Exchange" not in plan, plan


def test_unbucketed_join_needs_exchange(spark, bucketed_tables):
    # control: the same join without the layout shuffles — proving the
    # bucket declaration (not AQE luck) removed the Exchange above
    feats, _ = bucketed_tables
    plain = feats.sparkSession.range(0, 2000).select(
        F.concat(F.lit("c"), F.col("id")).alias("conv_id"),
        (F.col("id") % 13).alias("cluster_id"),
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _plan(feats.join(plain, "conv_id"))
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _scan_partitions_read(df) -> int:
    """Execute df and return the scan node's numPartitions metric — the
    number of partition DIRECTORIES actually opened after pruning
    (inputFiles() is relation-level and ignores pushed filters)."""
    df.collect()
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    for i in range(leaves.size()):
        node = leaves.apply(i)
        if "Scan" in node.nodeName():
            return node.metrics().apply("numPartitions").value()
    raise AssertionError("no scan node found")


def test_partitioned_read_prunes_directories(spark):
    path = tempfile.mkdtemp(prefix="part_events_")
    ev = spark.range(0, 300).select(
        F.col("id").alias("event_id"),
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 30).cast("int")).alias("day"),
        (F.col("id") * 7 % 100).alias("value"),
    )
    write_partitioned(ev, path, ["day"])

    scan = spark.read.parquet(path).filter(F.col("day") == "2024-01-05")
    plan = _plan(scan)
    assert "PartitionFilters" in plan and "2024-01-05" in plan, plan
    # of 30 day directories, exactly 1 is opened
    assert _scan_partitions_read(scan) == 1
    assert scan.count() == 10
    # a range predicate prunes too (30 days -> 5 directories)
    rng = spark.read.parquet(path).filter(
        (F.col("day") >= "2024-01-10") & (F.col("day") < "2024-01-15")
    )
    assert _scan_partitions_read(rng) == 5
    # control: the unfiltered scan opens all 30
    assert _scan_partitions_read(spark.read.parquet(path)) == 30
