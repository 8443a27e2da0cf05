"""Misra-Gries heavy hitters: superset guarantee, exactness on both the
certified-sketch path and the fallback path, partition independence."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from dedup.heavyhitters import heavy_hitters, mg_summaries


def _grams_df(spark, items, n_parts=4):
    return spark.createDataFrame(
        [(g,) for g in items], "gram string"
    ).repartition(n_parts)


def _exact_topk(items, k):
    c = Counter(items)
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(i + 1, g, n) for i, (g, n) in enumerate(ranked)]


def _skewed_corpus():
    # a few heavy grams + a long uniform tail
    items = []
    for i, reps in enumerate([400, 300, 200, 120, 80]):
        items += [f"heavy-{i}"] * reps
    items += [f"tail-{i % 97:02d}" for i in range(970)]  # 97 grams x 10
    return items


def test_mg_candidate_superset_guarantee(spark):
    """Every gram with global count > N/capacity must survive in some
    partition's summary — with a capacity small enough to force the
    batched decrement step repeatedly."""
    items = _skewed_corpus()
    capacity = 16
    df = _grams_df(spark, items, n_parts=4)
    summ = mg_summaries(df, capacity)
    cands = {
        r["gram"] for r in summ.filter(F.col("gram").isNotNull()).collect()
    }
    n = len(items)
    counts = Counter(items)
    must_survive = {g for g, c in counts.items() if c > n / capacity}
    assert must_survive, "test corpus must contain certifiable heavy hitters"
    assert must_survive <= cands
    # and the sentinel rows carry the exact N
    n_sent = (
        summ.filter(F.col("gram").isNull()).agg(F.sum("part_n")).collect()[0][0]
    )
    assert n_sent == n


def test_heavy_hitters_exact_certified_path(spark):
    """Top-k equals the brute-force answer when the sketch certifies."""
    items = _skewed_corpus()
    got = [
        (r["rank"], r["gram"], r["n"])
        for r in heavy_hitters(_grams_df(spark, items), 5, capacity=256)
        .orderBy("rank")
        .collect()
    ]
    assert got == _exact_topk(items, 5)


def test_heavy_hitters_exact_fallback_path(spark):
    """A near-uniform corpus cannot certify (k-th count <= N/capacity with a
    tiny capacity) — the fallback full aggregation must still be exact."""
    items = [f"g{i % 50:02d}" for i in range(500)]  # all counts equal (10)
    got = [
        (r["rank"], r["gram"], r["n"])
        for r in heavy_hitters(_grams_df(spark, items), 5, capacity=8)
        .orderBy("rank")
        .collect()
    ]
    assert got == _exact_topk(items, 5)


@pytest.mark.parametrize("n_parts", [1, 3, 8])
def test_heavy_hitters_partition_independent(spark, n_parts):
    """The exact result must not depend on how the gram stream is split
    (the sketch's intermediate state does — the answer must not)."""
    items = _skewed_corpus()
    got = [
        (r["rank"], r["gram"], r["n"])
        for r in heavy_hitters(_grams_df(spark, items, n_parts), 4, capacity=64)
        .orderBy("rank")
        .collect()
    ]
    assert got == _exact_topk(items, 4)
