"""Crafted-corpus boundary tests for the q73/q75/q77 analytics operators:
the driver's synthetic tables rarely land rows exactly ON a rule boundary
(the 60s debounce gap, a decile cut inside a tie run, dev == 3·MAD), so
these corpora put rows there deliberately and check the Spark query against
the DuckDB oracle SQL on the same file — plus explicit expectations for
each boundary branch."""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pytest

from dedup.queries import ORACLE_SQL, QUERIES

EPOCH = dt.datetime(2024, 1, 1)


def _parity(spark_df, con, sql, sort_cols):
    sdf = spark_df.toPandas().sort_values(sort_cols).reset_index(drop=True)
    ddf = con.execute(sql).df().sort_values(sort_cols).reset_index(drop=True)
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert len(sdf) == len(ddf)
    for i in range(len(sdf)):
        for c in sdf.columns:
            a, b = sdf.at[i, c], ddf.at[i, c]
            if isinstance(a, float) and not (
                isinstance(a, bool) or isinstance(b, bool)
            ):
                if math.isnan(a) or math.isnan(b):
                    assert math.isnan(a) and math.isnan(b), (i, c, a, b)
                else:
                    assert a == b, (i, c, a, b)
            else:
                assert a == b, (i, c, a, b)
    return sdf


@pytest.fixture(scope="module")
def debounce_dir(spark, tmp_path_factory):
    # user 1 / type a: leader at t=0; t=59s is INSIDE the window (dropped);
    # t=119s is exactly 60s after the previous (59s) event — boundary KEPT;
    # a second event at the same 119s timestamp breaks the tie on event_id
    # and is 0s after its predecessor — dropped. Type b and user 2 rows at
    # identical times prove key isolation.
    rows = []

    def add(eid, sec, user, typ):
        rows.append(
            {
                "event_id": eid,
                "ts": EPOCH + dt.timedelta(seconds=sec),
                "user_id": user,
                "event_type": typ,
                "value": 1.0,
                "props": "{}",
            }
        )

    add(1, 0, 1, "a")
    add(2, 59, 1, "a")     # gap 59s  -> dropped
    add(3, 119, 1, "a")    # gap 60s exactly -> kept (>= boundary)
    add(4, 119, 1, "a")    # tie ts, later event_id, gap 0 -> dropped
    add(5, 299, 1, "a")    # gap 180s -> kept
    add(6, 59, 1, "b")     # other type: its own leader -> kept
    add(7, 0, 2, "a")      # other user: leader -> kept
    add(8, 30, 2, "a")     # gap 30s -> dropped
    d = tmp_path_factory.mktemp("debounce")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d)


def test_q73_debounce_boundaries(spark, debounce_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{debounce_dir}/events.parquet/*.parquet')"
    )
    sdf = _parity(
        QUERIES["q73_events_debounce"](spark, debounce_dir),
        con,
        ORACLE_SQL["q73_events_debounce"],
        ["event_id"],
    )
    assert list(sdf["event_id"]) == [1, 3, 5, 6, 7]


@pytest.fixture(scope="module")
def decile_dir(spark, tmp_path_factory):
    # 13 docs, three heavy tie runs (6×5 chars, 4×7, 3×9): with N=13 and 10
    # tiles the first three tiles take 2 rows each, so cuts land INSIDE the
    # tie runs and the closed form must split them exactly like NTILE does
    # (by doc_id order within equal n_chars).
    lens = [5] * 6 + [7] * 4 + [9] * 3
    rows = [
        {
            "doc_id": i + 1,
            "text": "x" * n,
            "lang": "en",
            "source": "srcA",
            "n_chars": n,
        }
        for i, n in enumerate(lens)
    ]
    d = tmp_path_factory.mktemp("deciles")
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_q75_decile_closed_form_splits_ties_like_ntile(spark, decile_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{decile_dir}/documents.parquet/*.parquet')"
    )
    sdf = _parity(
        QUERIES["q75_docs_length_deciles"](spark, decile_dir),
        con,
        ORACLE_SQL["q75_docs_length_deciles"],
        ["decile"],
    )
    # NTILE(10) over 13 rows: tiles 1-3 hold 2 rows, 4-10 hold 1
    assert list(sdf["n_docs"]) == [2, 2, 2, 1, 1, 1, 1, 1, 1, 1]
    # the 6-long tie run of n_chars=5 spans tiles 1,2,3; tile 4 starts the
    # n_chars=7 run
    assert list(sdf["min_chars"])[:4] == [5, 5, 5, 7]


@pytest.fixture(scope="module")
def outlier_dir(spark, tmp_path_factory):
    # type 'eq': cents {0,10,20,30,50} -> median 20, deviations
    # {20,10,0,10,30}, MAD 10, 3·MAD = 30 == max deviation exactly: the
    # strict > rule must NOT flag it. Type 'gt' swaps 50 for 51 (dev 31):
    # one outlier.
    rows = []
    eid = 0
    for typ, cents in (
        ("eq", [0, 10, 20, 30, 50]),
        ("gt", [0, 10, 20, 30, 51]),
    ):
        for c in cents:
            eid += 1
            rows.append(
                {
                    "event_id": eid,
                    "ts": EPOCH + dt.timedelta(seconds=eid),
                    "user_id": 1,
                    "event_type": typ,
                    "value": c / 100.0,
                    "props": "{}",
                }
            )
    d = tmp_path_factory.mktemp("outliers")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d)


def test_q77_outlier_boundary_is_strict(spark, outlier_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{outlier_dir}/events.parquet/*.parquet')"
    )
    sdf = _parity(
        QUERIES["q77_events_robust_outliers"](spark, outlier_dir),
        con,
        ORACLE_SQL["q77_events_robust_outliers"],
        ["event_type"],
    )
    by_type = {r.event_type: r for r in sdf.itertuples(index=False)}
    assert by_type["eq"].median_cents == 20.0
    assert by_type["eq"].mad_cents == 10.0
    assert by_type["eq"].n_outliers == 0  # dev == 3*MAD exactly: not out
    assert by_type["gt"].n_outliers == 1  # dev 31 > 30


@pytest.fixture(scope="module")
def tiny_decile_dir(spark, tmp_path_factory):
    # fewer rows than tiles: base = N div 10 = 0, every rank lands in the
    # first branch (tile == rank) and the base-division branch must never
    # evaluate — NTILE emits tiles 1..7 with one row each
    rows = [
        {
            "doc_id": i + 1,
            "text": "y" * (i + 1),
            "lang": "en",
            "source": "srcA",
            "n_chars": i + 1,
        }
        for i in range(7)
    ]
    d = tmp_path_factory.mktemp("tinydeciles")
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_q75_fewer_rows_than_tiles(spark, tiny_decile_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tiny_decile_dir}/documents.parquet/*.parquet')"
    )
    sdf = _parity(
        QUERIES["q75_docs_length_deciles"](spark, tiny_decile_dir),
        con,
        ORACLE_SQL["q75_docs_length_deciles"],
        ["decile"],
    )
    assert list(sdf["decile"]) == [1, 2, 3, 4, 5, 6, 7]
    assert list(sdf["n_docs"]) == [1] * 7


@pytest.fixture(scope="module")
def sweep_dir(spark, tmp_path_factory):
    # four independent near-pairs with engineered 3-gram Jaccard: a base of
    # 200 unique tokens and a variant with the last k tokens replaced has
    # s = 198 shingles each, exactly k changed per side (a trailing edit
    # touches the k shingles ending in the edited span), so
    # j(k) = (s-k)/(s+k):  k=2 -> 0.980, 8 -> 0.922, 13 -> 0.877,
    # 19 -> 0.825 — one pair inside each sweep bucket.
    rows = []

    def doc(doc_id, tokens):
        text = " ".join(tokens)
        rows.append(
            {
                "doc_id": doc_id,
                "text": text,
                "lang": "en",
                "source": "srcA",
                "n_chars": len(text),
            }
        )

    for pair_i, k in enumerate([2, 8, 13, 19]):
        base = [f"p{pair_i}tok{j:04d}" for j in range(200)]
        var = base[:-k] + [f"p{pair_i}alt{j:04d}" for j in range(k)]
        doc(100 + pair_i * 2, base)
        doc(101 + pair_i * 2, var)
    d = tmp_path_factory.mktemp("sweep")
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_q79_sweep_buckets_all_fire(spark, sweep_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sweep_dir}/documents.parquet/*.parquet')"
    )
    sdf = _parity(
        QUERIES["q79_threshold_sweep"](spark, sweep_dir),
        con,
        ORACLE_SQL["q79_threshold_sweep"],
        ["threshold"],
    )
    # tightening the bar drops exactly one engineered pair per step
    assert list(sdf["n_edges"]) == [4, 3, 2, 1]
    assert list(sdf["n_nodes"]) == [8, 6, 4, 2]
    assert list(sdf["n_components"]) == [4, 3, 2, 1]
