"""Semantics tests for the round-4 planning/diagnostic operators.

The oracle rows prove Spark == DuckDB on the same closed form; these
tests prove the closed form equals the SPEC on crafted corpora where the
interesting branches actually fire:
  - q66's windowed closed form == the sequential UniMax greedy
    (exact-rational reference), including cap/no-cap mix and size ties;
  - q68's centroid identity == the brute-force pairwise mean dot,
    bit-exactly on the quantized integers;
  - q69's sufficient-statistics OLS == numpy's least squares;
  - q70's >= 0.7 drop verdict at the exact boundary.
"""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np
import pytest

from dedup.queries import QUERIES


def _words(k: int, tag: str) -> str:
    return " ".join(f"{tag}{i}" for i in range(k))


@pytest.fixture(scope="module")
def skew_doc_dir(spark, tmp_path_factory):
    # token totals per source: a=5, b=6, c=6 (tie with b), d=200, e=210,
    # f=220 — with B = 9/10 of 647 = 582 the greedy caps {a, b, c} and
    # splits the remainder equally across {d, e, f}
    sizes = [("a", 5), ("b", 6), ("c", 6), ("d", 200), ("e", 210), ("f", 220)]
    rows = [
        {"doc_id": i, "text": _words(k, f"s{s}w"), "lang": "en", "source": s}
        for i, (s, k) in enumerate(sizes)
    ]
    d = tmp_path_factory.mktemp("q66docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d), dict(sizes)


def _unimax_greedy(n_by_source: dict[str, int], budget: int):
    """The sequential UniMax spec (Chung '23, E=1), in exact rationals:
    ascending by (size, name); each source takes min(n, rem/remaining)."""
    order = sorted(n_by_source.items(), key=lambda kv: (kv[1], kv[0]))
    rem = Fraction(budget)
    out: dict[str, Fraction] = {}
    for i, (s, n) in enumerate(order):
        share = rem / (len(order) - i)
        alloc = min(Fraction(n), share)
        out[s] = alloc
        rem -= alloc
    return out


def test_q66_closed_form_equals_sequential_greedy(spark, skew_doc_dir):
    doc_dir, sizes = skew_doc_dir
    budget = sum(sizes.values()) * 9 // 10
    want = _unimax_greedy(sizes, budget)
    got = {
        r.source: r
        for r in QUERIES["q66_unimax_source_budgets"](spark, doc_dir)
        .toPandas()
        .itertuples(index=False)
    }
    assert set(got) == set(want)
    for s, alloc in want.items():
        r = got[s]
        assert r.n_tokens == sizes[s], s
        # capped iff the greedy gave the full size
        assert bool(r.capped) == (alloc == sizes[s]), s
        # exact-rational greedy -> nearest double == Spark's one division
        assert r.alloc_tokens == float(alloc), (s, r.alloc_tokens, alloc)
        # epochs is the double division of the (already-rounded) alloc by
        # n — mirror the same IEEE op, not the exact rational
        assert r.epochs == r.alloc_tokens / sizes[s], s
        if r.capped:
            assert r.epochs == 1.0, s
    # the crafted corpus really exercises both branches
    assert {s for s, r in got.items() if r.capped} == {"a", "b", "c"}
    # budget is conserved: sum of allocations == B exactly
    assert sum(want.values()) == budget


@pytest.fixture(scope="module")
def small_emb_dir(spark, tmp_path_factory):
    rng = np.random.RandomState(7)
    rows = []
    for vec_id in range(12):
        rows.append(
            {
                "vec_id": vec_id,
                "embedding": [
                    float(x) for x in rng.uniform(-0.4, 0.4, 6).astype("float32")
                ],
                "label": vec_id % 2,
            }
        )
    d = tmp_path_factory.mktemp("q68emb")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
    return str(d), rows


def test_q68_centroid_identity_equals_bruteforce_pairwise(
    spark, small_emb_dir
):
    emb_dir, rows = small_emb_dir
    got = {
        r.label: r
        for r in QUERIES["q68_embedding_dispersion"](spark, emb_dir)
        .toPandas()
        .itertuples(index=False)
    }
    for label in (0, 1):
        vecs = [
            np.floor(
                np.array(r["embedding"], dtype="float64") * 1048576.0 + 0.5
            ).astype("int64")
            for r in rows
            if r["label"] == label
        ]
        n = len(vecs)
        dots = [
            int(vecs[i] @ vecs[j])
            for i in range(n)
            for j in range(n)
            if i != j
        ]
        # brute-force pairwise mean on the same quantized ints, exact
        want = (sum(dots)) / (n * (n - 1) * 1099511627776.0)
        r = got[label]
        assert r.n_vectors == n
        assert r.centroid_sq - r.norms_sq == sum(dots)
        assert math.isclose(r.mean_pair_dot, want, rel_tol=1e-15)


def test_q69_sufficient_stats_match_numpy_lstsq(spark, tmp_path_factory):
    import datetime as dt

    rng = np.random.RandomState(11)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(400):
        hours = int(rng.randint(0, 720))
        # a known trend + noise, two event types with different slopes
        etype = "alpha" if i % 2 == 0 else "beta"
        slope = 0.05 if etype == "alpha" else -0.02
        val = 50.0 + slope * hours + float(rng.uniform(-1, 1))
        rows.append(
            {
                "event_id": i,
                "ts": base + dt.timedelta(hours=hours, seconds=int(rng.randint(0, 3599))),
                "user_id": i % 10,
                "event_type": etype,
                "value": round(max(val, 0.01), 2),
                "props": "{}",
            }
        )
    d = tmp_path_factory.mktemp("q69events")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    got = {
        r.event_type: r
        for r in QUERIES["q69_events_type_trend"](spark, str(d))
        .toPandas()
        .itertuples(index=False)
    }
    for etype in ("alpha", "beta"):
        xs = np.array(
            [
                (int(r["ts"].timestamp()) - 1704067200) // 3600
                for r in rows
                if r["event_type"] == etype
            ],
            dtype="float64",
        )
        ys = np.array(
            [
                round(r["value"] * 100) / 100.0
                for r in rows
                if r["event_type"] == etype
            ]
        )
        slope, intercept = np.polyfit(xs, ys, 1)
        r = got[etype]
        assert r.n_events == len(xs)
        assert math.isclose(r.slope_per_hour, slope, rel_tol=1e-9, abs_tol=1e-12)
        assert math.isclose(
            r.intercept_value, intercept, rel_tol=1e-9, abs_tol=1e-9
        )
        # the crafted trend is actually recovered
        want = 0.05 if etype == "alpha" else -0.02
        assert abs(r.slope_per_hour - want) < 0.01


def test_q70_drop_verdict_at_exact_boundary(spark, tmp_path_factory):
    # benchmark doc (id 0, doc_id % 5 == 0) provides the contaminated
    # window pool; crafted docs land exactly at, below, and above 70%
    bench = _words(30, "b")  # 23 8-grams, all "benchmark"
    bench_toks = bench.split(" ")

    def doc_with_frac(num: int, den: int, tag: str) -> str:
        # n_grams = den, hits = num: prefix of (num + 7) benchmark tokens
        # gives exactly num contaminated 8-grams; unique tail pads to den
        toks = bench_toks[: num + 7] + [
            f"{tag}{i}" for i in range(den - num)
        ]
        assert len(toks) - 7 == den
        return " ".join(toks)

    rows = [
        {"doc_id": 0, "text": bench, "lang": "en", "source": "s"},
        # 7/10 contaminated == 0.7 exactly -> dropped (>= rule)
        {"doc_id": 1, "text": doc_with_frac(7, 10, "eq"), "lang": "en", "source": "s"},
        # 6/10 -> kept
        {"doc_id": 2, "text": doc_with_frac(6, 10, "lo"), "lang": "en", "source": "s"},
        # 8/10 -> dropped
        {"doc_id": 3, "text": doc_with_frac(8, 10, "hi"), "lang": "en", "source": "s"},
        # shorter than 8 tokens -> zero grams, frac 0.0, kept
        {"doc_id": 4, "text": "tiny doc four tokens", "lang": "en", "source": "s"},
    ]
    d = tmp_path_factory.mktemp("q70docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    got = {
        r.doc_id: r
        for r in QUERIES["q70_contamination_severity"](spark, str(d))
        .toPandas()
        .itertuples(index=False)
    }
    assert got[0].contaminated_frac == 1.0 and bool(got[0].dropped)
    assert got[1].n_grams == 10 and got[1].hits == 7
    assert got[1].contaminated_frac == 0.7 and bool(got[1].dropped)
    assert got[2].contaminated_frac == 0.6 and not got[2].dropped
    assert got[3].contaminated_frac == 0.8 and bool(got[3].dropped)
    assert got[4].n_grams == 0 and got[4].contaminated_frac == 0.0
    assert not got[4].dropped
