"""Round-6 optimization internals (OPTIMIZATION_r06.md).

Pins the correctness contracts of the plan-construction / fixed-cost
optimizations: the memoized unified-key-table expression tree must be
config-keyed (never leak one config's bands into another's table), the
shared key-table fast path must be result-identical, and the incremental
merge's scale-adaptive conf override must always restore the session's
planning profile (success AND failure paths).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedup.candidates import unified_candidates, unified_key_table
from dedup.config import DedupConfig
from dedup.features import featurize


@pytest.fixture()
def feats(spark, config):
    docs = spark.createDataFrame(
        [(f"c{i:03d}", "alpha beta gamma delta epsilon zeta eta theta " * 3)
         for i in range(12)],
        "conv_id string, norm_text string",
    )
    return featurize(docs, config).localCheckpoint()


def _key_counts(df):
    return {
        int(r["src"]): int(r["n"])
        for r in df.groupBy("src").agg(F.count("*").alias("n")).collect()
    }


def test_key_expr_cache_is_config_keyed(spark, feats, config):
    """Two different configs must produce different key tables (a cache
    collision would silently reuse the wrong band/chunk expressions)."""
    base = _key_counts(unified_key_table(feats, config))
    n_docs = feats.count()
    # 32 bands + (hamming_d + 1) chunks per doc (identical docs -> same fps)
    assert base[0] == n_docs * config.lsh_bands
    assert base[1] == n_docs * (config.hamming_d + 1)

    half = config.with_(lsh_bands=16)
    got = _key_counts(unified_key_table(feats, half))
    assert got[0] == n_docs * 16
    wide = config.with_(hamming_d=7)
    got = _key_counts(unified_key_table(feats, wide))
    assert got[1] == n_docs * 8

    # and the original config again (cache-hit path) is unchanged
    assert _key_counts(unified_key_table(feats, config)) == base


def test_unified_candidates_accepts_prebuilt_key_table(spark, feats, config):
    """The incremental merge hands unified_candidates its already-built key
    table; the pair set must be identical to the self-derived path."""
    kt = unified_key_table(feats, config)
    a = sorted(map(tuple, unified_candidates(feats, config).collect()))
    b = sorted(map(tuple, unified_candidates(feats, config, key_table=kt).collect()))
    assert a == b and len(a) > 0


def test_merge_restores_session_planning_conf(spark, config, tmp_path):
    """merge_with_prior narrows shuffle partitions / disables AQE+codegen
    for its batch-sized plans; the session conf must come back exactly."""
    from dedup.fixtures import gen_transcripts
    from dedup.incremental import merge_new_conversations
    from dedup.pipeline import run_pipeline

    turns = gen_transcripts(spark, 30, seed=7, partitions=2, edge_rows=False)
    run_pipeline(spark, turns, config, str(tmp_path / "runs"), "prior")
    new = gen_transcripts(spark, 60, seed=7, partitions=2, edge_rows=False).filter(
        F.col("conv_id") >= "c00000030"
    )

    keys = (
        "spark.sql.shuffle.partitions",
        "spark.sql.adaptive.enabled",
        "spark.sql.codegen.wholeStage",
    )
    before = {k: spark.conf.get(k, None) for k in keys}
    out = merge_new_conversations(
        spark, new, str(tmp_path / "runs"), "prior", config,
        str(tmp_path / "runs"), "incr",
    )
    assert out["clusters"].count() > 0
    after = {k: spark.conf.get(k, None) for k in keys}
    assert after == before


def test_materialize_reread_schema_matches_inference(spark, config, tmp_path):
    """The schema-supplied stage re-read (0 footer-inference jobs) must be
    byte-identical to what a schema-less read would infer — all-nullable,
    nested collections included — or downstream unions/plan shapes drift."""
    from dedup.state import RunState

    state = RunState(spark, str(tmp_path), "r", config)
    df = spark.createDataFrame(
        [("a", [1, 2], 3)], "conv_id string, xs array<bigint>, n bigint"
    ).select("conv_id", "xs", F.col("n"), F.lit(7).alias("k"))
    got = state.materialize("s1", lambda: df)
    inferred = spark.read.parquet(state.stage_path("s1")).drop("_part_id")
    assert got.schema == inferred.schema
    assert [tuple(r) for r in got.orderBy("conv_id").collect()] == [
        ("a", [1, 2], 3, 7)
    ]


def test_cc_raw_edge_collect_paths(spark, config):
    """The small-graph fast path collects RAW (possibly duplicated) edges;
    duplicates are no-op unions, so the assignment must equal the distinct
    graph's — and the raw count overflowing the threshold must fall back to
    the distributed loop with identical clusters."""
    from dedup.cc import connected_components

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "b"), ("x", "y"), ("b", "a")],
        "a string, b string",
    )
    want = [("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")]
    got, rounds = connected_components(edges, config)
    assert sorted(map(tuple, got.collect())) == want and rounds == 0

    # raw count (5) > threshold (3) >= distinct count would previously take
    # the union-find path; now it must take the distributed loop — and
    # still produce the identical assignment
    tiny = config.with_(cc_local_threshold=3)
    got2, rounds2 = connected_components(edges, tiny)
    assert sorted(map(tuple, got2.collect())) == want and rounds2 > 0


def test_partcache_schema_reuse_across_parts(spark, tmp_path):
    """PartCache.scan reuses one inferred schema per stage: parts written
    with and without the _part_id bookkeeping column must read identically
    (parquet projection tolerates both directions)."""
    from dedup.streaming import PartCache

    p1 = str(tmp_path / "p1")  # run-style part: carries _part_id
    spark.createDataFrame(
        [("a", 1)], "conv_id string, v bigint"
    ).withColumn("_part_id", F.lit(0)).write.parquet(p1)
    p2 = str(tmp_path / "p2")  # fold-style part: no _part_id
    spark.createDataFrame([("b", 2)], "conv_id string, v bigint").write.parquet(p2)

    cache = PartCache()
    try:
        d1 = cache.scan(spark, p1, stage="s")
        d2 = cache.scan(spark, p2, stage="s")
        assert d1.schema == d2.schema
        assert "_part_id" not in d1.columns
        rows = sorted(map(tuple, d1.unionByName(d2).collect()))
        assert rows == [("a", 1), ("b", 2)]
    finally:
        cache.release()


def test_estimate_input_rows(spark, tmp_path):
    """Footer-exact row estimate: exact for plain parquet scans, None for
    non-file inputs (the profile then waits for the materialized count)."""
    from dedup.incremental import _estimate_input_rows

    p = str(tmp_path / "t")
    spark.range(0, 137).write.parquet(p)
    assert _estimate_input_rows(spark.read.parquet(p)) == 137
    assert _estimate_input_rows(spark.createDataFrame([(1,)], "a bigint")) is None


def test_pipeline_restores_session_conf_small_run(spark, config, tmp_path):
    """run_pipeline's small-run planning profile (applied for < 10k docs)
    must restore the session conf exactly — unset keys back to unset."""
    from dedup.fixtures import gen_transcripts
    from dedup.pipeline import run_pipeline

    keys = (
        "spark.sql.shuffle.partitions",
        "spark.sql.adaptive.enabled",
        "spark.sql.codegen.wholeStage",
    )
    before = {k: spark.conf.get(k, None) for k in keys}
    turns = gen_transcripts(spark, 25, seed=11, partitions=2, edge_rows=False)
    out = run_pipeline(spark, turns, config, str(tmp_path / "runs"), "small")
    assert out["clusters"].count() > 0
    assert {k: spark.conf.get(k, None) for k in keys} == before
