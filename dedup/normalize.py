"""Text normalization (SURVEY.md §2.8 / §2.10).

NFKC folding has no Spark SQL builtin, so normalization is an Arrow-batched
scalar pandas UDF (BASELINE.json:6 "normalized ... via vectorized
Arrow/pandas UDFs"); everything else in the pipeline stays JVM-side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F, types as T


@F.pandas_udf(T.StringType())
def normalize_text(texts: pd.Series) -> pd.Series:
    """NFKC → lowercase → collapse whitespace → strip.

    Vectorized via pandas .str ops over each Arrow batch; no per-row Python
    UDF (binding constraint BASELINE.json:15).
    """
    s = texts.fillna("")
    s = s.str.normalize("NFKC").str.lower()
    s = s.str.replace(r"\s+", " ", regex=True).str.strip()
    return s


def normalize_sql(col: Column) -> Column:
    """ANSI-expressible normalizer (lower + whitespace collapse, no NFKC) —
    used by oracle-checked queries so DuckDB can reproduce it exactly."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


NORMALIZE_DUCKDB_SQL = "trim(regexp_replace(lower({col}), '\\s+', ' ', 'g'))"
