"""Crafted-corpus semantic pins for the round-4 analytics batches: the
oracle rows prove Spark↔DuckDB parity, but parity alone can't show the
FORMULA is right — these corpora pin known closed-form answers (Gini of a
uniform corpus is exactly 0, a 5-then-2 multiset loses exactly 3, a count
tie resolves to the lexicographically larger type, a 3-day run is the
longest island) and re-check engine/oracle parity on the same file."""

from __future__ import annotations

import datetime as dt
import hashlib

import duckdb
import pytest

from dedup.queries import ORACLE_SQL, QUERIES

EPOCH = dt.datetime(2024, 1, 1)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _write_events(spark, tmp_path_factory, name, rows):
    d = tmp_path_factory.mktemp(name)
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / "events.parquet"))
    return str(d)


def _con(sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    return con


def _ev(eid, sec, user, typ, value=1.0, props="{}"):
    return {
        "event_id": eid,
        "ts": EPOCH + dt.timedelta(seconds=sec),
        "user_id": user,
        "event_type": typ,
        "value": value,
        "props": props,
    }


def _parity_rows(spark_df, con, sql, sort_cols):
    sdf = spark_df.toPandas().sort_values(sort_cols).reset_index(drop=True)
    ddf = con.execute(sql).df().sort_values(sort_cols).reset_index(drop=True)
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert len(sdf) == len(ddf)
    for c in sdf.columns:
        assert list(sdf[c]) == list(ddf[c]), (c, list(sdf[c]), list(ddf[c]))
    return sdf


def test_q94_gini_uniform_is_zero_and_known_case(spark, tmp_path_factory):
    # uniform: 3 users x 2 events each -> G == 0.0 exactly
    rows = [_ev(i, i, i % 3 + 1, "a") for i in range(6)]
    d = _write_events(spark, tmp_path_factory, "gini_uniform", rows)
    sdf = _parity_rows(
        QUERIES["q94_user_activity_gini"](spark, d),
        _con(d),
        ORACLE_SQL["q94_user_activity_gini"],
        ["n_users"],
    )
    assert sdf.at[0, "gini"] == 0.0 and sdf.at[0, "n_users"] == 3

    # counts {1, 3}: sorted x=[1,3] -> G = (2*(1*1+2*3) - 3*4) / (2*4) = 0.25
    rows = [_ev(1, 0, 1, "a")] + [_ev(i + 2, i, 2, "a") for i in range(3)]
    d = _write_events(spark, tmp_path_factory, "gini_known", rows)
    sdf = _parity_rows(
        QUERIES["q94_user_activity_gini"](spark, d),
        _con(d),
        ORACLE_SQL["q94_user_activity_gini"],
        ["n_users"],
    )
    assert sdf.at[0, "gini"] == 0.25


def test_q110_except_all_is_multiset_not_set(spark, tmp_path_factory):
    H2 = 16 * 86400  # seconds from 2024-01-01 to the 2024-01-16 split
    rows = (
        # user 1 clicks 5x in h1, 2x in h2 -> loses exactly 3 (a SET
        # except would lose 0 — the type survives in h2)
        [_ev(i, i, 1, "click") for i in range(5)]
        + [_ev(10 + i, H2 + i, 1, "click") for i in range(2)]
        # user 2: 2x view h1, 3x view h2 -> fully covered, no loss
        + [_ev(20 + i, i, 2, "view") for i in range(2)]
        + [_ev(30 + i, H2 + i, 2, "view") for i in range(3)]
        # user 3: h1-only type -> loses all 2
        + [_ev(40 + i, i, 3, "error") for i in range(2)]
    )
    d = _write_events(spark, tmp_path_factory, "exceptall", rows)
    sdf = _parity_rows(
        QUERIES["q110_behavior_churn"](spark, d),
        _con(d),
        ORACLE_SQL["q110_behavior_churn"],
        ["user_id", "event_type"],
    )
    got = {
        (r.user_id, r.event_type): r.n_lost for r in sdf.itertuples()
    }
    assert got == {(1, "click"): 3, (3, "error"): 2}


def test_q113_max_by_tie_resolves_lexicographically(spark, tmp_path_factory):
    rows = (
        # user 1: a x2, b x2 -> tie on count, dominant must be 'b'
        [_ev(1, 0, 1, "a"), _ev(2, 1, 1, "a"),
         _ev(3, 2, 1, "b"), _ev(4, 3, 1, "b")]
        # user 2: c x3 beats a x1 regardless of lexicographic order
        + [_ev(5, 0, 2, "c"), _ev(6, 1, 2, "c"), _ev(7, 2, 2, "c"),
           _ev(8, 3, 2, "a")]
    )
    d = _write_events(spark, tmp_path_factory, "maxby", rows)
    sdf = _parity_rows(
        QUERIES["q113_dominant_user_type"](spark, d),
        _con(d),
        ORACLE_SQL["q113_dominant_user_type"],
        ["user_id"],
    )
    got = {r.user_id: (r.dominant_type, r.n_dominant) for r in sdf.itertuples()}
    assert got == {1: ("b", 2), 2: ("c", 3)}


def test_q118_islands_longest_streak(spark, tmp_path_factory):
    day = 86400
    # user 1 active on days 0,1,2, 5, 7,8 (several events on day 1 must
    # not inflate anything) -> n_active 6, longest 3
    rows = [
        _ev(1, 0 * day, 1, "a"),
        _ev(2, 1 * day, 1, "a"),
        _ev(3, 1 * day + 60, 1, "b"),
        _ev(4, 2 * day, 1, "a"),
        _ev(5, 5 * day, 1, "a"),
        _ev(6, 7 * day, 1, "a"),
        _ev(7, 8 * day, 1, "a"),
        # user 2: one day only
        _ev(8, 3 * day, 2, "a"),
    ]
    d = _write_events(spark, tmp_path_factory, "islands", rows)
    sdf = _parity_rows(
        QUERIES["q118_longest_active_streak"](spark, d),
        _con(d),
        ORACLE_SQL["q118_longest_active_streak"],
        ["user_id"],
    )
    got = {
        r.user_id: (r.n_active_days, r.longest_streak)
        for r in sdf.itertuples()
    }
    assert got == {1: (6, 3), 2: (1, 1)}


def test_q120_signature_order_pinned(spark, tmp_path_factory):
    # same-ts events must order by event_id: signature is a>b>c, not a>c>b
    rows = [
        _ev(1, 0, 1, "a"),
        _ev(2, 60, 1, "b"),
        _ev(3, 60, 1, "c"),  # ts tie with event 2 -> after it
    ]
    d = _write_events(spark, tmp_path_factory, "sig", rows)
    sdf = _parity_rows(
        QUERIES["q120_behavior_signatures"](spark, d),
        _con(d),
        ORACLE_SQL["q120_behavior_signatures"],
        ["user_id"],
    )
    expected = hashlib.md5(b"a>b>c").hexdigest()
    assert sdf.at[0, "signature_fp"] == expected


def test_q126_set_drift_boundaries(spark, tmp_path_factory):
    H2 = 16 * 86400
    rows = (
        # user 1: identical type sets both halves -> jaccard 1.0
        [_ev(1, 0, 1, "a"), _ev(2, 1, 1, "b"),
         _ev(3, H2, 1, "b"), _ev(4, H2 + 1, 1, "a")]
        # user 2: h1-only -> jaccard 0.0 with n_total > 0
        + [_ev(5, 0, 2, "a")]
        # user 3: {a, b} then {b, c} -> 1/3
        + [_ev(6, 0, 3, "a"), _ev(7, 1, 3, "b"),
           _ev(8, H2, 3, "b"), _ev(9, H2 + 1, 3, "c")]
    )
    d = _write_events(spark, tmp_path_factory, "setdrift", rows)
    sdf = _parity_rows(
        QUERIES["q126_behavior_set_drift"](spark, d),
        _con(d),
        ORACLE_SQL["q126_behavior_set_drift"],
        ["user_id"],
    )
    got = {r.user_id: r.type_jaccard for r in sdf.itertuples()}
    assert got[1] == 1.0
    assert got[2] == 0.0
    assert got[3] == pytest.approx(1.0 / 3.0, abs=0)
