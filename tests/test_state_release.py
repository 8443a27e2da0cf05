"""RunState.release() scoping: persist-mode checkpoint blocks are freed,
but unrelated persisted/checkpointed DataFrames in the same (shared)
session survive — ADVICE r2: a context-wide getPersistentRDDs() sweep
would truncate THEIR lineage too and leave them unrecomputable."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from dedup.config import DedupConfig
from dedup.state import RunState


def _persistent_rdd_ids(spark) -> set[int]:
    return {int(k) for k in spark.sparkContext._jsc.getPersistentRDDs().keySet()}


def test_release_scoped_to_own_checkpoints(spark):
    cfg = DedupConfig(shuffle_partitions=4)
    # sentinel: an unrelated localCheckpoint-ed DF "owned by someone else"
    sentinel = (
        spark.range(0, 100).withColumn("x", F.col("id") * 2).localCheckpoint(eager=True)
    )
    assert sentinel.count() == 100
    before = _persistent_rdd_ids(spark)

    state = RunState(spark, tempfile.mkdtemp(prefix="relstate_"), "r", cfg, mode="persist")
    df = state.materialize("stage_a", lambda: spark.range(0, 50).withColumn("y", F.col("id") + 1))
    assert df.count() == 50
    mid = _persistent_rdd_ids(spark)
    added = mid - before
    assert added, "persist-mode stage must register checkpoint blocks"

    state.release()
    after = _persistent_rdd_ids(spark)
    # this run's blocks are gone...
    assert not (added & after), "release() must free this run's checkpoint RDDs"
    # ...and the sentinel survives AND is still usable (lineage was truncated
    # by localCheckpoint — unpersisting it would have made count() fail)
    assert before <= after | added  # sentinel's ids untouched
    assert sentinel.count() == 100


def test_release_noop_in_parquet_mode(spark):
    cfg = DedupConfig(shuffle_partitions=4)
    state = RunState(spark, tempfile.mkdtemp(prefix="relstate2_"), "r", cfg)
    state.materialize("stage_a", lambda: spark.range(0, 10))
    before = _persistent_rdd_ids(spark)
    state.release()
    assert _persistent_rdd_ids(spark) == before
