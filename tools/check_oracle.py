"""Local stand-in for the driver's correctness harness: run every
oracle-checked query in Spark and DuckDB on the same sf dir and compare
row count, column names, and order-insensitive values.

The comparison core lives in dedup/oracle_check.py (shared with the
pytest board gate, tests/test_oracle_board.py); this is the CLI wrapper.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dedup.config import DedupConfig
from dedup.oracle_check import check_query, oracle_connection
from dedup.queries import ORACLE_SQL
from dedup.session import build_session


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = build_session(master="local[8]", config=DedupConfig(shuffle_partitions=8))
    con = oracle_connection(sf_dir)
    failures = 0
    for name, sql in ORACLE_SQL.items():
        if only and name not in only:
            continue
        err = check_query(spark, con, sf_dir, name, sql)
        if err is None:
            print(f"ok   {name}")
        else:
            print(f"FAIL {name}: {err}")
            failures += 1
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
