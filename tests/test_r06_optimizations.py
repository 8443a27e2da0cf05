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
