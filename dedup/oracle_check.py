"""DuckDB oracle parity checker — the importable core of
tools/check_oracle.py, shared with the pytest board gate
(tests/test_oracle_board.py, VERDICT r4 #3).

Mirrors the driver's correctness harness: for every query with an
ORACLE_SQL row, run the Spark implementation and the ANSI-SQL oracle on
the same parquet tables and compare row count, column names, numeric
dtype family (int vs float — the driver's value-hash renders int64 99111
!= float64 99111.0), and order-insensitive %.9g-normalized values.
"""

from __future__ import annotations

import math

import duckdb

from .queries import ORACLE_SQL, QUERIES

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def oracle_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def rows_key(pdf) -> list[str]:
    cols = sorted(pdf.columns)
    out = []
    for _, row in pdf[cols].iterrows():
        out.append("|".join(norm_cell(v) for v in row))
    return sorted(out)


def check_query(spark, con, sf_dir: str, name: str, sql: str) -> str | None:
    """Run one query both ways; return None if they agree, else a short
    failure description."""
    try:
        sdf = QUERIES[name](spark, sf_dir).toPandas()
        ddf = con.execute(sql).df()
    except Exception as e:  # noqa: BLE001 — report, don't crash the sweep
        return f"exception {type(e).__name__}: {e}"
    if sorted(sdf.columns) != sorted(ddf.columns):
        return f"columns spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}"
    if len(sdf) != len(ddf):
        return f"rows spark={len(sdf)} duck={len(ddf)}"

    from pandas.api import types as ptypes

    def kind(s):
        if ptypes.is_integer_dtype(s):
            return "int"
        if ptypes.is_float_dtype(s):
            return "float"
        return "other"

    bad = {
        c: (str(sdf[c].dtype), str(ddf[c].dtype))
        for c in sdf.columns
        if kind(sdf[c]) != kind(ddf[c])
    }
    if bad:
        return f"numeric dtype mismatch spark-vs-duck {bad}"
    ks, kd = rows_key(sdf), rows_key(ddf)
    if ks != kd:
        diffs = [(a, b) for a, b in zip(ks, kd) if a != b][:3]
        return f"value mismatch, first diffs: {diffs}"
    return None


def run_board(
    spark, sf_dir: str, names=None, verbose: bool = False
) -> dict[str, str]:
    """Check every ORACLE_SQL row (or `names`) at sf_dir; returns
    {query_name: failure_description} — empty dict == all green."""
    con = oracle_connection(sf_dir)
    only = set(names) if names else None
    failures: dict[str, str] = {}
    for name, sql in ORACLE_SQL.items():
        if only and name not in only:
            continue
        err = check_query(spark, con, sf_dir, name, sql)
        if err is not None:
            failures[name] = err
            if verbose:
                print(f"FAIL {name}: {err}")
        elif verbose:
            print(f"ok   {name}")
    con.close()
    return failures
