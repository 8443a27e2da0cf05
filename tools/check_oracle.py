"""Local stand-in for the driver's correctness harness: run every
oracle-checked query in Spark and DuckDB on the same sf dir and compare
row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dedup.config import DedupConfig
from dedup.queries import ORACLE_SQL, QUERIES
from dedup.session import build_session

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def rows_key(pdf):
    cols = sorted(pdf.columns)
    out = []
    for _, row in pdf[cols].iterrows():
        out.append("|".join(norm_cell(v) for v in row))
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = build_session(master="local[8]", config=DedupConfig(shuffle_partitions=8))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = 0
    for name, sql in ORACLE_SQL.items():
        if only and name not in only:
            continue
        try:
            sdf = QUERIES[name](spark, sf_dir).toPandas()
            ddf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exception {type(e).__name__}: {e}")
            failures += 1
            continue
        ok = True
        if sorted(sdf.columns) != sorted(ddf.columns):
            print(f"FAIL {name}: columns spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}")
            ok = False
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}")
            ok = False
        if ok:
            # the driver's value-hash renders ints and floats differently
            # (int64 99111 != float64 99111.0 — bit q08 in round 1); %.9g
            # normalization below masks that, so flag int-vs-float columns.
            # (Unit-only differences like datetime64[ns] vs [us] are fine.)
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
                print(f"FAIL {name}: numeric dtype mismatch spark-vs-duck {bad}")
                ok = False
        if ok:
            ks, kd = rows_key(sdf), rows_key(ddf)
            if ks != kd:
                diffs = [(a, b) for a, b in zip(ks, kd) if a != b][:3]
                print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
                ok = False
        if ok:
            print(f"ok   {name} ({len(sdf)} rows)")
        else:
            failures += 1
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
