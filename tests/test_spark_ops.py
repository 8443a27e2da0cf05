"""Spark-side operator tests: reassembly invariant, candidate generation
(incl. hot-key capping), connected components, fixtures determinism."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from dedup.candidates import bucket_pairs, canonical_pairs
from dedup.cc import connected_components
from dedup.config import DedupConfig
from dedup.fixtures import gen_transcripts, gen_quarantine_fixture
from dedup.io import TRANSCRIPT_SCHEMA
from dedup.reassemble import explode_back, reassemble, split_valid


def _turns(spark, rows):
    return spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)


# --- reassembly / row invariant ---

def test_reassemble_stable_order_and_roundtrip(spark):
    import datetime as dt

    ts = dt.datetime(2025, 1, 1)
    rows = [
        ("c1", 2, "user", "third", None, ts),
        ("c1", 0, "user", "first", None, ts),
        ("c1", 1, "assistant", "second", None, ts),
        ("c2", 0, "user", "only", None, ts),
        ("c3", 0, "user", "", None, ts),       # empty text survives as a slot
        ("c3", 5, "user", "gap", None, ts),    # turn_idx gap: order still stable
    ]
    docs = reassemble(_turns(spark, rows).repartition(4))
    got = {r["conv_id"]: r["doc_text"] for r in docs.collect()}
    assert got == {"c1": "first\nsecond\nthird", "c2": "only", "c3": "\ngap"}

    # round-trip: explode_back recovers per-turn text in order (row invariant)
    back = explode_back(docs.filter("conv_id = 'c1'")).orderBy("turn_idx").collect()
    assert [r["text"] for r in back] == ["first", "second", "third"]


def test_reassemble_order_independent_of_partitioning(spark):
    df = gen_transcripts(spark, 30, seed=7, partitions=1, edge_rows=False)
    d1 = reassemble(df).orderBy("conv_id").collect()
    d2 = reassemble(df.repartition(13, "turn_idx")).orderBy("conv_id").collect()
    assert [r["doc_text"] for r in d1] == [r["doc_text"] for r in d2]


def test_quarantine_duplicate_turn_idx(spark):
    good, bad = split_valid(gen_quarantine_fixture(spark))
    assert {r["conv_id"] for r in good.collect()} == {"ok"}
    assert bad.count() == 2  # both ambiguous rows quarantined


# --- candidate generation ---

def test_bucket_pairs_small_bucket_all_pairs(spark):
    cfg = DedupConfig(bucket_cap=10, shuffle_partitions=4)
    rows = [(1, f"c{i}") for i in range(4)] + [(2, "c9"), (3, "c1"), (3, "c2")]
    df = spark.createDataFrame(rows, "fp long, conv_id string")
    pairs = {
        (r["a"], r["b"]) for r in bucket_pairs(df, ["fp"], cfg).collect()
    }
    expect = {("c0", "c1"), ("c0", "c2"), ("c0", "c3"), ("c1", "c2"),
              ("c1", "c3"), ("c2", "c3")}
    assert pairs == expect  # (c1,c2) deduped across fp=1 and fp=3


def test_bucket_pairs_hot_key_linear_chain(spark):
    cfg = DedupConfig(bucket_cap=8, shuffle_partitions=4)
    n = 100
    df = spark.createDataFrame([(1, f"c{i:03d}") for i in range(n)], "fp long, conv_id string")
    out = bucket_pairs(df, ["fp"], cfg).collect()
    # linear in bucket size: lag-1 (n-1) + lag-2 (n-2) + star-to-min (n-1,
    # of which 2 duplicate the lags) = 3n - 6 pairs, not n*(n-1)/2
    assert len(out) == 3 * n - 6
    # edges connect every member transitively
    nodes = {r["a"] for r in out} | {r["b"] for r in out}
    assert len(nodes) == n


def _components(nodes, edges):
    parent = {x: x for x in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a in parent and b in parent:
            parent[find(a)] = find(b)
    return {frozenset(x for x in nodes if find(x) == r) for r in {find(x) for x in nodes}}


def test_bucket_pairs_poisoned_hot_bucket_recall(spark):
    """A hot bucket where false-collision members interleave true duplicates
    AND the bucket minimum is a false collision: after the verifier drops
    every edge touching an interloper, the true duplicates must still form
    one connected component (lag-1-only chaining failed this)."""
    cfg = DedupConfig(bucket_cap=8, shuffle_partitions=4)
    n = 12
    members = [f"a{i:02d}" for i in range(n)]
    true_dups = {m for i, m in enumerate(members) if i % 2 == 1}  # min is an interloper
    df = spark.createDataFrame([(1, m) for m in members], "fp long, conv_id string")
    edges = [(r["a"], r["b"]) for r in bucket_pairs(df, ["fp"], cfg).collect()]
    surviving = [
        (a, b) for a, b in edges if a in true_dups and b in true_dups
    ]  # simulated verification: interloper edges all fail
    comps = _components(true_dups, surviving)
    assert comps == {frozenset(true_dups)}


def test_canonical_pairs(spark):
    df = spark.createDataFrame(
        [("b", "a"), ("a", "b"), ("x", "x")], "a string, b string"
    )
    got = canonical_pairs(df).collect()
    assert [(r["a"], r["b"]) for r in got] == [("a", "b")]


# --- connected components (both paths: driver union-find + distributed) ---

import pytest


def _cc(spark, edges, cfg):
    df = spark.createDataFrame(edges, "a string, b string")
    out, rounds = connected_components(df, cfg)
    return {r["conv_id"]: r["cluster_id"] for r in out.collect()}, rounds


@pytest.fixture(params=["local_uf", "distributed"])
def cc_config(request, config):
    # threshold 0 forces the large-star/small-star loop
    return config if request.param == "local_uf" else config.with_(cc_local_threshold=0)


def test_cc_chain(spark, cc_config):
    got, _ = _cc(spark, [("a", "b"), ("b", "c"), ("c", "d")], cc_config)
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a"}


def test_cc_two_components_and_star(spark, cc_config):
    edges = [("a", "b"), ("c", "d"), ("c", "e"), ("c", "f")]
    got, _ = _cc(spark, edges, cc_config)
    assert got == {"a": "a", "b": "a", "c": "c", "d": "c", "e": "c", "f": "c"}


def test_cc_empty(spark, config):
    df = spark.createDataFrame([], "a string, b string")
    out, rounds = connected_components(df, config)
    assert out.count() == 0 and rounds == 0


def test_cc_long_chain_logarithmic_rounds(spark, config):
    n = 64
    edges = [(f"n{i:03d}", f"n{i+1:03d}") for i in range(n - 1)]
    got, rounds = _cc(spark, edges, config.with_(cc_local_threshold=0))
    assert set(got.values()) == {"n000"}
    assert 1 <= rounds <= 12  # O(log n), not O(n)


def test_cc_paths_agree_random_graph(spark, config):
    import numpy as np

    rng = np.random.default_rng(9)
    edges = [
        (f"v{int(rng.integers(0, 80)):03d}", f"v{int(rng.integers(0, 80)):03d}")
        for _ in range(120)
    ]
    edges = [e for e in edges if e[0] != e[1]]
    a, _ = _cc(spark, edges, config)
    b, _ = _cc(spark, edges, config.with_(cc_local_threshold=0))
    assert a == b


# --- fixtures ---

def test_fixtures_deterministic_and_schema(spark):
    d1 = gen_transcripts(spark, 50, seed=5, partitions=3)
    d2 = gen_transcripts(spark, 50, seed=5, partitions=7)
    assert d1.schema == TRANSCRIPT_SCHEMA
    r1 = sorted(map(tuple, d1.collect()))
    r2 = sorted(map(tuple, d2.collect()))
    assert r1 == r2
    # different seed -> different corpus
    d3 = gen_transcripts(spark, 50, seed=6, partitions=3)
    assert sorted(map(tuple, d3.collect())) != r1


# --- corpus diagnostics (§2.4 A8, §2.6 O3) ---

def test_corpus_stats_accuracy(spark):
    """approx_count_distinct (HLL++) must land within its documented
    relative error on a known cardinality; exact aggregates exact."""
    rows = [
        (f"c{i:04d}", f"text body number {i % 80}", 2 + (i % 3), 40, False)
        for i in range(400)
    ]
    docs = spark.createDataFrame(
        rows, "conv_id string, norm_text string, n_turns int, n_chars long, ambiguous boolean"
    )
    from dedup.metrics import corpus_stats

    r = corpus_stats(docs, seed=7).collect()[0]
    assert r["n_docs"] == 400
    # default rsd is 5%; allow 3 sigma on 80 distinct texts
    assert abs(r["approx_distinct_texts"] - 80) <= 0.15 * 80
    # i%3 over 400 rows: 134 twos, 133 threes, 133 fours
    assert abs(r["avg_turns"] - (2 * 134 + 3 * 133 + 4 * 133) / 400) < 1e-9
    assert r["sampled_avg_chars"] == 40.0  # every row has n_chars = 40
