"""Pin `compact_reopen(scope="dirty")`'s O(dirty) scale contract
(VERDICT r4 "What's wrong #1" / "Next #1").

The dirty-scope probe is a conv_id semi-join applied ON TOP of the
full-input multiplicity aggregation in `streaming._multiplicity_turns`;
the documented "reads O(dirty)" claim is true only because Catalyst's
PushDownLeftSemiAntiJoin pushes that probe below both aggregates (legal
because conv_id is in every grouping set). Nothing in the code forces
that — so two tests pin it:

1. plan shape: the optimized plan of the scoped probe must have the
   `Join LeftSemi` BELOW both multiplicity `Aggregate`s (i.e. the join
   appears deeper in the printed tree than the aggregates);
2. behavior: a dirty-scoped compaction over a 4x input history with the
   same-sized dirty set must keep shuffle-record counts ~flat (scans may
   grow; exchanges must not).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from dedup.config import DedupConfig
from dedup.fixtures import gen_transcripts
from dedup.streaming import (
    _multiplicity_turns,
    _scope_to,
    compact_reopen,
    current_clusters,
    dirty_conversations,
    stream_dedup,
)


def _write_corpus(spark, n_convs: int, input_dir: str):
    corpus = gen_transcripts(
        spark, n_convs, seed=31, partitions=4, edge_rows=False
    ).localCheckpoint()
    corpus.repartition(2, "conv_id").write.mode("append").parquet(input_dir)
    return corpus


def test_dirty_probe_semi_join_pushed_below_multiplicity_aggregates(spark):
    corpus_dir = tempfile.mkdtemp(prefix="compact_plan_in_")
    _write_corpus(spark, 60, corpus_dir)
    dirty = spark.createDataFrame([("c00000001",), ("c00000002",)], "conv_id string")

    probe = _scope_to(_multiplicity_turns(spark, corpus_dir), dirty)
    plan = probe._jdf.queryExecution().optimizedPlan().toString()

    # exactly the two multiplicity aggregates, and the semi-join strictly
    # below (later in the printed top-down tree than) both of them
    assert plan.count("Aggregate [") == 2, plan
    join_at = plan.find("Join LeftSemi")
    assert join_at != -1, plan
    last_agg_at = plan.rfind("Aggregate [")
    assert last_agg_at < join_at, (
        "dirty-scope semi-join no longer pushes below the multiplicity "
        "aggregates — scope='dirty' now shuffles the full input history "
        "per compaction:\n" + plan
    )
    # and the pushed probe sits directly over the parquet scan side
    assert "Relation" in plan[join_at:], plan


def _shuffle_records(spark) -> tuple[int, int]:
    jvm = spark.sparkContext._jvm
    store = spark.sparkContext._jsc.sc().statusStore()
    empty = jvm.java.util.ArrayList()
    quantiles = spark.sparkContext._gateway.new_array(jvm.double, 0)
    stages = store.stageList(empty, False, False, quantiles, empty)
    read = write = 0
    for i in range(stages.size()):
        st = stages.apply(i)
        read += st.shuffleReadRecords()
        write += st.shuffleWriteRecords()
    return int(read), int(write)


def _dirty_compact_shuffle_delta(spark, cfg, n_prior: int) -> tuple[int, int]:
    """Bootstrap a stream over n_prior conversations, grow a FIXED-SIZE set
    of already-promoted singleton conversations (drain marks them dirty),
    then measure the shuffle records of the dirty-scoped compaction."""
    input_dir = tempfile.mkdtemp(prefix=f"compact_in_{n_prior}_")
    stream_dir = tempfile.mkdtemp(prefix=f"compact_state_{n_prior}_")
    _write_corpus(spark, n_prior, input_dir)
    stream_dedup(spark, input_dir, stream_dir, cfg)

    # grow 8 singleton conversations (singletons so touched == changed and
    # the re-ingest size is identical across corpus sizes)
    clusters = current_clusters(spark, stream_dir)
    singles = (
        clusters.groupBy("cluster_id")
        .agg(F.count("*").alias("n"), F.min("conv_id").alias("conv_id"))
        .filter(F.col("n") == 1)
        .select("conv_id")
        .orderBy("conv_id")
        .limit(8)
    )
    ids = [r.conv_id for r in singles.collect()]
    assert len(ids) == 8
    growth = spark.createDataFrame(
        [(cid, 999, "user", f"growth turn appended after promotion {cid}", None)
         for cid in ids],
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", F.to_timestamp(F.lit("2026-01-01 00:00:00")))
    growth.coalesce(1).write.mode("append").parquet(input_dir)
    stream_dedup(spark, input_dir, stream_dir, cfg)  # drain -> skip + dirty
    assert dirty_conversations(spark, stream_dir).count() == 8

    r0, w0 = _shuffle_records(spark)
    n_reopen = compact_reopen(spark, input_dir, stream_dir, cfg, scope="dirty")
    r1, w1 = _shuffle_records(spark)
    assert n_reopen == 8
    assert current_clusters(spark, stream_dir).count() >= n_prior
    return r1 - r0, w1 - w0


def test_dirty_compaction_shuffle_is_dirty_sized_not_history_sized(spark):
    cfg = DedupConfig(shuffle_partitions=8)
    r_small, w_small = _dirty_compact_shuffle_delta(spark, cfg, 120)
    r_big, w_big = _dirty_compact_shuffle_delta(spark, cfg, 480)

    # 4x the input history, same 8-conversation dirty set: the compaction's
    # shuffled rows must stay ~flat. If the semi-join pushdown regresses,
    # the multiplicity aggregation shuffles the full history and these
    # deltas scale ~4x.
    assert w_big < 1.8 * max(w_small, 1), (w_small, w_big)
    assert r_big < 1.8 * max(r_small, 1), (r_small, r_big)


def _parts_read_plan(spark, tmp_path, k_deltas: int) -> str:
    """Physical plan of a latest-by state read over base + k delta parts."""
    from dedup.streaming import _read_parts

    base = tmp_path / "base"
    spark.createDataFrame(
        [(f"c{i:05d}", f"cl{i % 7}") for i in range(200)],
        "conv_id string, cluster_id string",
    ).coalesce(1).write.mode("overwrite").parquet(str(base))
    parts = [[str(base), 0]]
    for s in range(1, k_deltas + 1):
        d = tmp_path / f"delta{s}"
        spark.createDataFrame(
            [(f"c{i:05d}", f"cl{s}x") for i in range(s, s + 5)],
            "conv_id string, cluster_id string",
        ).coalesce(1).write.mode("overwrite").parquet(str(d))
        parts.append([str(d), s])
    df = _read_parts(spark, parts, latest_by="conv_id")
    return df._jdf.queryExecution().executedPlan().toString()


def test_read_parts_plan_is_linear_in_part_count(spark, tmp_path):
    """The state read's plan must not GROW in exchange count with the part
    list: the old per-level anti-join chain built K nested distinct
    exchanges (O(K^2) plan nodes), which made per-micro-batch cost climb
    with drain length — Catalyst re-analysis alone reached tens of seconds
    by part 9. The rewritten shape is one broadcast anti-join on the base
    plus one batch-scale window over the deltas, so the exchange count is
    a constant, whatever the part count."""
    p3 = _parts_read_plan(spark, tmp_path / "k3", 3)
    p12 = _parts_read_plan(spark, tmp_path / "k12", 12)
    assert p12.count("Exchange") == p3.count("Exchange"), (
        p3.count("Exchange"),
        p12.count("Exchange"),
    )
    # and the constant is small: the window's exchange + the broadcast
    # (possibly reused); corpus-sized base rows are never hash-partitioned
    assert p3.count("hashpartitioning") <= 2, p3


def test_read_parts_precedence_latest_wins(spark, tmp_path):
    """Value check for the rewritten read: highest-seq part wins per key,
    same-seq parts are key-disjoint unions, base rows without a newer
    version survive."""
    from dedup.streaming import _read_parts

    def write(name, rows):
        d = tmp_path / name
        spark.createDataFrame(
            rows, "conv_id string, cluster_id string"
        ).coalesce(1).write.mode("overwrite").parquet(str(d))
        return str(d)

    parts = [
        [write("b0", [("a", "base"), ("b", "base"), ("c", "base")]), 0],
        [write("d1", [("b", "s1"), ("d", "s1")]), 1],
        # two key-disjoint parts at one seq (compaction delta + tombstones)
        [write("d2a", [("b", "s2"), ("e", "s2")]), 2],
        [write("d2b", [("d", "s2b")]), 2],
    ]
    got = {
        r.conv_id: r.cluster_id
        for r in _read_parts(spark, parts, latest_by="conv_id").collect()
    }
    assert got == {"a": "base", "b": "s2", "c": "base", "d": "s2b", "e": "s2"}
