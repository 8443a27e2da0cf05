"""Skew-aware candidate pair generation from bucket tables
(SURVEY.md §2.3 J1/J2, §2.2 P3/P4, §2.4 A4).

Shared by all three candidate sources: LSH band keys, SimHash pigeonhole
chunks, suffix-window fingerprints. The #1 scale risk is a hot bucket
(BASELINE.json:14 "salted, skew-aware repartitioning on band keys"):
exploding a hot key into pairs is quadratic before any join tuning helps.

Strategy, one shuffle each:
 1. bucket sizes via a salted two-stage aggregate (never a single hot
    reducer), joined back onto the bucket table;
 2. keys with 2 <= n <= cap: groupBy + bounded collect_list (sorted) →
    all pairs generated JVM-side with higher-order array functions — no
    self-join, so no duplicate scan of the bucket table;
 3. keys with n > cap: sorted-neighbor chain pairs via a window lag —
    linear in bucket size, spills instead of OOM. Chain adjacency keeps
    every true duplicate in the bucket connected for clustering while the
    per-pair verifier still gates each edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .config import DedupConfig


def salted_sizes(df: DataFrame, key_cols: list[str], config: DedupConfig) -> DataFrame:
    """Two-stage (salted) count per key: groupBy(key, salt) partial →
    groupBy(key) final. Output: key_cols + n."""
    salt = F.pmod(F.xxhash64("conv_id"), F.lit(config.salt_buckets)).alias("_salt")
    partial = df.groupBy(*key_cols, salt).agg(F.count("*").alias("_c"))
    return partial.groupBy(*key_cols).agg(F.sum("_c").cast("long").alias("n"))


def bucket_pairs(
    bucket_df: DataFrame,
    key_cols: list[str],
    config: DedupConfig,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """(key..., conv_id [, payload...]) -> canonical candidate pairs (a < b)
    [+ payload_a/payload_b columns], deduplicated across keys."""
    from pyspark import StorageLevel

    payload_cols = payload_cols or []
    members = bucket_df.select(*key_cols, "conv_id", *payload_cols).distinct()
    sizes = salted_sizes(members, key_cols, config)
    # persisted: both the small-bucket and hot-bucket branches read this —
    # without it the whole upstream (scan + distinct + sizing) runs twice.
    # Freed by the pipeline's post-stage cache clear.
    with_n = members.join(sizes, key_cols).persist(StorageLevel.MEMORY_AND_DISK)

    mem = F.struct(F.col("conv_id"), *[F.col(c) for c in payload_cols]).alias("m")

    # --- small buckets: bounded collect + JVM-side pair comprehension ---
    small = (
        with_n.filter((F.col("n") >= 2) & (F.col("n") <= config.bucket_cap))
        .groupBy(*key_cols)
        .agg(F.sort_array(F.collect_list(mem)).alias("ms"))
    )
    arr = F.col("ms")
    pair_structs = F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + 2, F.size(arr)), lambda y: F.struct(x.alias("x"), y.alias("y"))
            ),
        )
    )
    small_pairs = small.select(F.explode(pair_structs).alias("p")).select(
        F.col("p.x.conv_id").alias("a"),
        F.col("p.y.conv_id").alias("b"),
        *[F.col(f"p.x.{c}").alias(f"{c}_a") for c in payload_cols],
        *[F.col(f"p.y.{c}").alias(f"{c}_b") for c in payload_cols],
    )

    # --- hot buckets: linear sorted-neighbor chain ---
    w = Window.partitionBy(*key_cols).orderBy("conv_id")
    hot = with_n.filter(F.col("n") > config.bucket_cap)
    prev = F.lag(F.struct(F.col("conv_id"), *[F.col(c) for c in payload_cols])).over(w)
    hot_pairs = (
        hot.withColumn("_prev", prev)
        .filter(F.col("_prev").isNotNull())
        .select(
            F.col("_prev.conv_id").alias("a"),
            F.col("conv_id").alias("b"),
            *[F.col(f"_prev.{c}").alias(f"{c}_a") for c in payload_cols],
            *[F.col(c).alias(f"{c}_b") for c in payload_cols],
        )
    )

    out_cols = ["a", "b"] + [f"{c}_a" for c in payload_cols] + [f"{c}_b" for c in payload_cols]
    return (
        small_pairs.unionByName(hot_pairs)
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
        .select(*out_cols)
    )


def bucket_stats(bucket_df: DataFrame, key_cols: list[str], config: DedupConfig) -> DataFrame:
    """Diagnostics for metrics: bucket-size histogram summary per source."""
    sizes = salted_sizes(
        bucket_df.select(*key_cols, "conv_id").distinct(), key_cols, config
    )
    return sizes.agg(
        F.count("*").alias("n_keys"),
        F.sum(F.when(F.col("n") >= 2, 1).otherwise(0)).alias("n_matchable_keys"),
        F.sum(F.when(F.col("n") > config.bucket_cap, 1).otherwise(0)).alias("n_hot_keys"),
        F.max("n").alias("max_bucket"),
        F.expr("approx_percentile(n, 0.99)").alias("p99_bucket"),
    )


def canonical_pairs(df: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Order endpoints (a < b), drop self-pairs, dedup (P4)."""
    return (
        df.select(
            F.least(F.col(a), F.col(b)).alias("a"),
            F.greatest(F.col(a), F.col(b)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
