"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``dedup`` package (see SURVEY.md §2 for the
operator inventory each query exercises).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from dedup.queries import ORACLE_SQL, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full MinHash+SimHash+suffix dedup + clustering pipeline on
    /root/testdata/sf0.001 documents (as 1-turn transcripts); returns
    (conv_id, cluster_id)."""
    return QUERIES["q20_dedup_clusters"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
