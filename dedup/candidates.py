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

from pyspark.sql import DataFrame, functions as F

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
    assume_distinct: bool = False,
) -> DataFrame:
    """(key..., conv_id [, payload...]) -> canonical candidate pairs (a < b)
    [+ payload_a/payload_b columns], deduplicated across keys.

    Physical plan — ONE data shuffle: hash-repartition on the bucket key,
    sort within partitions (JVM radix sort; a hot key's rows land in one
    partition and spill-sort instead of OOM), then a single vectorized Arrow
    scan emits pairs per contiguous key group: all-pairs for buckets with
    2..cap members (numpy triu indices), linear sorted-neighbor chains for
    hot buckets. Singleton buckets — the overwhelming majority — are
    eliminated with vectorized boundary masks, never a Python loop. Only the
    final cross-key pair dedup shuffles again, and that runs on the (tiny)
    pair set. Set assume_distinct when (key, conv_id) rows are unique by
    construction to skip the defensive distinct.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    payload_cols = payload_cols or []
    members = bucket_df.select(*key_cols, "conv_id", *payload_cols)
    if not assume_distinct:
        members = members.distinct()
    parts = members.repartition(
        config.shuffle_partitions, *key_cols
    ).sortWithinPartitions(*key_cols, "conv_id")

    cap = config.bucket_cap
    n_payload = len(payload_cols)
    out_cols = ["a", "b"] + [f"{c}_a" for c in payload_cols] + [f"{c}_b" for c in payload_cols]
    out_schema = "a string, b string" + "".join(
        f", {c}_{s} long" for s in ("a", "b") for c in payload_cols
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = key_cols + ["conv_id"] + payload_cols
        carry: pd.DataFrame | None = None  # open (last) group at batch edge
        carry_hot = False  # that group already exceeded cap → chain mode

        def emit(group: pd.DataFrame, chain: bool) -> pd.DataFrame | None:
            n = len(group)
            if n < 2:
                return None
            cids = group["conv_id"].to_numpy()
            if chain or n > cap:
                ii = np.arange(n - 1)
                jj = ii + 1
            else:
                ii, jj = np.triu_indices(n, k=1)
            rows = {"a": cids[ii], "b": cids[jj]}
            for c in payload_cols:
                pay = group[c].to_numpy()
                rows[f"{c}_a"] = pay[ii]
                rows[f"{c}_b"] = pay[jj]
            return pd.DataFrame(rows)

        def flush(pdf: pd.DataFrame, final: bool) -> pd.DataFrame | None:
            nonlocal carry, carry_hot
            was_hot = carry_hot
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            carry, carry_hot = None, False
            m = len(pdf)
            if m == 0:
                return None
            boundary = np.zeros(m, dtype=bool)
            boundary[0] = True
            for c in key_cols:
                karr = pdf[c].to_numpy()
                boundary[1:] |= karr[1:] != karr[:-1]
            starts_idx = np.flatnonzero(boundary)
            sizes = np.diff(np.concatenate([starts_idx, [m]]))
            n_groups = len(starts_idx)
            outs = []

            def handle(g: int, closing: bool) -> None:
                nonlocal carry, carry_hot
                grp = pdf.iloc[starts_idx[g] : starts_idx[g] + sizes[g]]
                hot = (g == 0 and was_hot) or len(grp) > cap
                if closing:
                    outs.append(emit(grp, chain=hot))
                elif hot:
                    # open hot group: emit its chain so far, keep only the
                    # last member — bounded memory however large the flood
                    outs.append(emit(grp, chain=True))
                    carry, carry_hot = grp.iloc[[-1]], True
                else:
                    carry, carry_hot = grp, False

            # vectorized singleton elimination: only groups with >=2 rows
            # (or the continuing hot group) ever reach Python
            limit = n_groups if final else n_groups - 1
            interesting = (sizes[:limit] >= 2).copy()
            if limit > 0 and was_hot:
                interesting[0] = True
            for g in np.flatnonzero(interesting):
                handle(int(g), closing=True)
            if not final:
                handle(n_groups - 1, closing=False)
            frames = [o for o in outs if o is not None and len(o)]
            return pd.concat(frames, ignore_index=True) if frames else None

        for pdf in batches:
            out = flush(pdf[cols], final=False)
            if out is not None:
                yield out[out_cols]
        out = flush(pd.DataFrame(columns=cols), final=True)
        if out is not None:
            yield out[out_cols]

    pairs = parts.mapInPandas(scan, out_schema)
    return (
        pairs.filter(F.col("a") != F.col("b"))
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
