"""Tiered dedup verdicts from the pipeline's own outputs (the production
counterpart of q35's oracle-checked composition).

Downstream curation applies per-tier policy — drop exact clones, keep one
representative per near-dup cluster, down-weight substring overlaps (the
tier treatment of Lee'22 §5 / Penedo'23 §5) — so the engine surfaces each
conversation's STRONGEST duplication tier as a first-class relation:

  3 "exact"      — member of an exact-dup group of size > 1 (exact_groups)
  2 "near"       — its representative participates in a Jaccard-verified
                   pair (verified.source == 'jaccard')
  1 "substring"  — representative participates in a substring-verified
                   pair (verified.source == 'substring'), Jaccard-failed
  0 "unique"     — none of the above

Because the near-dup stages run over exact REPRESENTATIVES only, the
near/substring lookups join on the conversation's own id: singleton-group
conversations are their own representative, and exact clones of a paired
representative already carry the higher exact tier.

Scale shape: three flag relations (each bounded by the dup population, not
the corpus) left-joined onto the doc spine on conv_id — no shuffle wider
than the dup sets; tier arithmetic is a JVM CASE chain. q35 holds the
engine-portable oracle for the same tier semantics on `documents`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TIER_LABELS = ("unique", "substring", "near", "exact")


def _participants(pairs: DataFrame, flag: str) -> DataFrame:
    return (
        pairs.select(F.col("a").alias("conv_id"))
        .unionByName(pairs.select(F.col("b").alias("conv_id")))
        .distinct()
        .withColumn(flag, F.lit(True))
    )


def tier_assignments(
    docs: DataFrame, exact_groups: DataFrame, verified: DataFrame
) -> DataFrame:
    """(conv_id, tier_rank, tier) for every doc in `docs`, from the
    pipeline outputs of the same names (run_pipeline's dict)."""
    sizes = exact_groups.groupBy("exact_rep").agg(F.count("*").alias("n"))
    exact_docs = (
        exact_groups.join(sizes.filter(F.col("n") > 1), "exact_rep")
        .select("conv_id")
        .withColumn("is_exact", F.lit(True))
    )
    near_docs = _participants(
        verified.filter(F.col("source") == "jaccard"), "is_near"
    )
    sub_docs = _participants(
        verified.filter(F.col("source") == "substring"), "is_sub"
    )
    rank = (
        F.when(F.col("is_exact"), 3)
        .when(F.col("is_near"), 2)
        .when(F.col("is_sub"), 1)
        .otherwise(0)
    )
    labels = F.array(*[F.lit(t) for t in TIER_LABELS])
    return (
        docs.select("conv_id")
        .join(exact_docs, "conv_id", "left")
        .join(near_docs, "conv_id", "left")
        .join(sub_docs, "conv_id", "left")
        .select(
            "conv_id",
            rank.cast("int").alias("tier_rank"),
            F.element_at(labels, rank + 1).alias("tier"),
        )
    )


def tier_summary(tiers: DataFrame) -> DataFrame:
    """Corpus rollup: conversations per tier (metrics-table shape)."""
    return tiers.groupBy("tier_rank", "tier").agg(
        F.count("*").cast("long").alias("n_convs")
    )
