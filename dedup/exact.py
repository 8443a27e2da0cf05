"""Exact-duplicate collapse (SURVEY.md §2.4 A7).

This is the set-at-a-time replacement of the reference's per-event
hash-lookup (BASELINE.json:6: FastAPI/Postgres SELECT-by-hash → skip/insert):
group by a 64+256-bit content fingerprint of the reassembled document; the
minimum conv_id of each group is the representative ("already seen" ≙ not
the representative).

Running this *before* the near-dup paths is also the primary skew defense:
identical-text floods collapse to one representative and never reach LSH
(SURVEY.md §7 risk 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def exact_key(col: str = "doc_text") -> F.Column:
    # xxhash64 alone risks birthday collisions at 10^12 docs; pair it with
    # sha2-256 so the group key is effectively collision-free.
    return F.struct(
        F.xxhash64(F.col(col)).alias("h64"),
        F.sha2(F.col(col), 256).alias("h256"),
    )


def exact_groups(docs: DataFrame) -> DataFrame:
    """(conv_id, doc_text, ...) -> (conv_id, exact_rep) for every doc;
    exact_rep = min conv_id among identical doc_texts.

    One min-window over the hash key instead of groupBy + join back: the
    join shape scanned (and content-hashed) the doc set twice and shuffled
    it twice; the window shuffles it once. Memory: WindowExec buffers one
    hash group at a time and spills — an identical-text flood lands on one
    reducer either way (the join had the same hot key), and this pass is
    itself the skew defense that keeps such floods out of LSH.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("k")
    return (
        docs.select("conv_id", exact_key().alias("k"))
        .select("conv_id", F.min("conv_id").over(w).alias("exact_rep"))
    )


def exact_pairs(groups: DataFrame) -> DataFrame:
    """Edges (rep, member) for members != rep — linear, never quadratic."""
    return (
        groups.filter(F.col("conv_id") != F.col("exact_rep"))
        .select(
            F.least("exact_rep", "conv_id").alias("a"),
            F.greatest("exact_rep", "conv_id").alias("b"),
        )
    )


def representatives(docs: DataFrame, groups: DataFrame) -> DataFrame:
    """Docs restricted to exact representatives (input to near-dup paths)."""
    return docs.join(
        groups.filter(F.col("conv_id") == F.col("exact_rep")).select("conv_id"),
        "conv_id",
        "left_semi",
    )
