"""Distributed heavy hitters: Misra-Gries candidate sketch + exact verify.

"What boilerplate dominates the corpus?" is a standard curation diagnostic
(the most frequent n-grams are license headers, nav bars, prompt templates).
The naive answer — groupBy(gram).count().orderBy(...) — shuffles the FULL
gram cardinality, which at 100 TB is itself corpus-sized. The classic
two-pass fix (public method: Misra-Gries '82 summaries, mergeable per
Agarwal et al. PODS'12):

  pass 1  per-partition Misra-Gries summary of capacity m, via mapInPandas
          (bounded memory, one sequential scan, no shuffle). The union of
          per-partition summaries is a GUARANTEED superset of every item
          with global count > N/m: if an item survives nowhere, each
          partition decremented it to zero, and a partition's total
          decrement mass is at most N_p/m, so the item's global count is
          at most sum_p N_p/m = N/m.
  pass 2  exact counts for the candidate set only: broadcast the candidate
          grams, semi-join-reduce the gram stream, and aggregate — the
          shuffle now carries candidate rows only.

The result is EXACT (and therefore oracle-checkable) whenever the k-th
heaviest count exceeds N/m; the runtime certificate below enforces that
bound and falls back to the full aggregation if the sketch was too small —
correctness never depends on the sketch. Two full scans total (the
information-theoretic floor for exact answers), and the only shuffled rows
are candidate matches.

The MG maintenance is the batched variant: merge a pandas value_counts
into the running dict, and when the dict exceeds capacity, subtract the
(size-m)-th smallest count from everything and drop the non-positive
residuals (one numpy partition-select per overflow instead of per-item
decrement loops). Each partition also emits one sentinel row carrying its
row count, so pass 1 doubles as the exact-N computation the certificate
needs — no third scan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_SUMMARY_SCHEMA = StructType(
    [StructField("gram", StringType()), StructField("part_n", LongType())]
)


def _mg_partition(batches, capacity: int):
    """Batched Misra-Gries over an iterator of pandas batches (one call per
    partition); yields surviving candidate grams + an N-sentinel row."""
    import numpy as np

    counts: dict = {}
    n_rows = 0
    for pdf in batches:
        n_rows += len(pdf)
        for gram, c in pdf["gram"].value_counts().items():
            counts[gram] = counts.get(gram, 0) + int(c)
        if len(counts) > capacity:
            vals = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
            # subtract the d-th smallest residual (d = overflow) so at most
            # `capacity` strictly-positive entries remain
            d = len(counts) - capacity
            delta = int(np.partition(vals, d - 1)[d - 1])
            counts = {g: c - delta for g, c in counts.items() if c - delta > 0}
    yield pd.DataFrame(
        {
            "gram": list(counts.keys()) + [None],
            "part_n": [None] * len(counts) + [n_rows],
        }
    )


def mg_summaries(grams: DataFrame, capacity: int) -> DataFrame:
    """Per-partition MG summaries (candidate grams + per-partition row-count
    sentinels with gram IS NULL), one mapInPandas pass, no shuffle."""
    return grams.select("gram").mapInPandas(
        lambda it: _mg_partition(it, capacity), schema=_SUMMARY_SCHEMA
    )


def heavy_hitters(
    grams: DataFrame, k_top: int, capacity: int = 4096
) -> DataFrame:
    """Exact global top-k most frequent grams, computed the scale way:
    MG candidate sketch -> broadcast semi-join -> exact count -> top-k,
    with the N/capacity guarantee checked at runtime (falls back to the
    full aggregation if the sketch cannot certify exactness).

    Returns (rank:int, gram:string, n:long), ties broken lexicographically.
    """
    spark = grams.sparkSession
    summ = mg_summaries(grams, capacity).localCheckpoint(eager=True)
    n_total = summ.filter(F.col("gram").isNull()).agg(
        F.sum("part_n")
    ).collect()[0][0] or 0
    cand = summ.filter(F.col("gram").isNotNull()).select("gram").distinct()
    exact = (
        grams.join(F.broadcast(cand), "gram")
        .groupBy("gram")
        .agg(F.count("*").cast("long").alias("n"))
    )
    w = Window.orderBy(F.desc("n"), F.asc("gram"))
    rows = (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_top)
        .select(F.col("rank").cast("int").alias("rank"), "gram", "n")
        .collect()
    )  # k rows — bounded by construction
    schema = StructType(
        [
            StructField("rank", IntegerType()),
            StructField("gram", StringType()),
            StructField("n", LongType()),
        ]
    )
    # MG certificate: every gram with count > N/capacity is in the candidate
    # set, so if the k-th count clears that bar the top-k is provably exact
    if len(rows) == k_top and rows[-1]["n"] * capacity > n_total:
        return spark.createDataFrame(rows, schema)
    full = grams.groupBy("gram").agg(F.count("*").cast("long").alias("n"))
    return (
        full.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_top)
        .select(F.col("rank").cast("int").alias("rank"), "gram", "n")
    )
