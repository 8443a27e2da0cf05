"""O(delta) compute evidence for the incremental/streaming merge
(VERDICT r3 #1): a micro-batch's merge must SHUFFLE rows proportional to
the batch, not the corpus.

The candidate stage equi-joins the batch's bucket keys against the
persisted candidate index (candidates.index_join_pairs), the exact stage
probes the persisted hash index, and every prior-state lookup is a scan +
broadcast probe — so quadrupling the prior corpus must leave the merge's
shuffle-record count essentially flat (scans grow; exchanges don't).

Shuffle records are read from Spark's AppStatusStore (the UI-less local
equivalent of the Spark UI REST stage metrics).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from dedup.config import DedupConfig
from dedup.fixtures import gen_transcripts
from dedup.streaming import current_clusters, process_batch, stream_dedup


def _shuffle_records(spark) -> tuple[int, int]:
    """Cumulative (shuffle read, shuffle write) records across all stages
    the status store retains."""
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


def _merge_shuffle_delta(spark, cfg, n_prior: int, batch_df) -> tuple[int, int]:
    """Bootstrap a stream state over an n_prior-conversation corpus, then
    measure the shuffle records of merging one fixed micro-batch into it."""
    prior = gen_transcripts(
        spark, n_prior, seed=31, partitions=4, edge_rows=False
    ).localCheckpoint()
    tmp = tempfile.mkdtemp(prefix=f"delta_in_{n_prior}_")
    stream_dir = tempfile.mkdtemp(prefix=f"delta_state_{n_prior}_")
    prior.repartition(2, "conv_id").write.mode("append").parquet(tmp)
    stream_dedup(spark, tmp, stream_dir, cfg)

    r0, w0 = _shuffle_records(spark)
    process_batch(spark, batch_df, 1, stream_dir, cfg)
    r1, w1 = _shuffle_records(spark)
    assert current_clusters(spark, stream_dir).count() == n_prior + 20
    return r1 - r0, w1 - w0


def test_merge_shuffle_is_batch_sized_not_corpus_sized(spark):
    cfg = DedupConfig(shuffle_partitions=8)
    # 20 new conversations with ids disjoint from every prior corpus below
    batch = (
        gen_transcripts(spark, 1000, seed=32, partitions=2, edge_rows=False)
        .filter(F.col("conv_id") >= "c00000980")
        .localCheckpoint()
    )

    r_small, w_small = _merge_shuffle_delta(spark, cfg, 120, batch)
    r_big, w_big = _merge_shuffle_delta(spark, cfg, 480, batch)

    # 4x the prior corpus, same batch: shuffled rows must stay ~flat. The
    # old shape (bucket tables rebuilt over all prior reps) scaled these
    # linearly with the corpus — a 4x corpus produced ~4x shuffle rows.
    assert w_big < 1.8 * max(w_small, 1), (w_small, w_big)
    assert r_big < 1.8 * max(r_small, 1), (r_small, r_big)


def test_index_join_plan_never_shuffles_the_index(spark, config):
    """The candidate index side of the incremental equi-join must be a
    broadcast hash join (index scanned, batch keys broadcast) — a sort-merge
    join would re-shuffle the O(corpus) index every micro-batch."""
    from dedup.candidates import index_join_pairs, unified_key_table
    from dedup.features import featurize

    docs = spark.createDataFrame(
        [(f"c{i:04d}", "alpha beta gamma delta epsilon zeta " * 4) for i in range(30)],
        "conv_id string, norm_text string",
    )
    feats = featurize(docs, config).localCheckpoint()
    keys = unified_key_table(feats, config)
    index = unified_key_table(feats, config)
    pairs = index_join_pairs(keys, index, config)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan, plan
