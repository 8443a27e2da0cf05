"""Embedding-space similarity ops (training-data-pipeline extensions):
cosine near-duplicate pairs, brute-force k-NN, and a hyperplane-LSH
(SRP-SimHash) bucketed scale path.

The brute-force paths are the correctness baseline (DuckDB-oracle-checked in
queries.py: same sequential double accumulation order on both engines). The
scale path reuses the same skew-aware machinery as text dedup: 64-bit signed
random projection signatures (Charikar, STOC'02 — the same Hamming-ball
pigeonhole join as simhash.py) with exact-cosine verification JVM-side, so
false bucket collisions never merge.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from .config import DedupConfig
from .simhash import chunk_table


def dot_expr(a: str, b: str) -> Column:
    """Sequential double-precision dot product of two array<float> columns —
    JVM-side, same accumulation order as DuckDB's list_dot_product."""
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(F.col(a), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_expr(a: str, b: str, na: str, nb: str) -> Column:
    return dot_expr(a, b) / (F.col(na) * F.col(nb))


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding", "label")
        .withColumn("nrm", norm_expr("embedding"))
    )


def cosine_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = 0.95
) -> DataFrame:
    """Brute-force all-pairs cosine >= threshold (a < b). O(n²) — the oracle
    baseline; the LSH path below is the scale path."""
    e = load_embeddings(spark, sf_dir).repartition(32, "vec_id")
    l = e.select(
        F.col("vec_id").alias("a"), F.col("embedding").alias("va"), F.col("nrm").alias("na")
    )
    r = e.select(
        F.col("vec_id").alias("b"), F.col("embedding").alias("vb"), F.col("nrm").alias("nb")
    )
    cos = F.round(
        dot_expr("va", "vb") / (F.col("na") * F.col("nb")), 6
    ).alias("cos")
    return (
        l.crossJoin(r)
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", cos)
        .filter(F.col("cos") >= threshold)
    )


def knn_topk(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Brute-force cosine top-k neighbors per vector (rank ties broken by
    neighbor id for determinism)."""
    from pyspark.sql import Window

    e = load_embeddings(spark, sf_dir).repartition(32, "vec_id")
    l = e.select(
        F.col("vec_id").alias("q"), F.col("embedding").alias("vq"), F.col("nrm").alias("nq")
    )
    r = e.select(
        F.col("vec_id").alias("n"), F.col("embedding").alias("vn"), F.col("nrm").alias("nn")
    )
    cos = F.round(dot_expr("vq", "vn") / (F.col("nq") * F.col("nn")), 6).alias("cos")
    w = Window.partitionBy("q").orderBy(F.desc("cos"), F.asc("n"))
    return (
        l.crossJoin(r)
        .filter(F.col("q") != F.col("n"))
        .select("q", "n", cos)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def planted_near_dupes(
    spark: SparkSession, sf_dir: str, noise: float = 0.1, seed: int = 42
) -> DataFrame:
    """Driver embeddings ∪ deterministic perturbed clones (vec_id + 10^6):
    a near-dup fixture for the ANN scale path (the driver's vectors are
    near-orthogonal — max pairwise cos ≈ 0.48 measured — so true neighbor
    structure must be planted)."""
    from typing import Iterator

    def perturb(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_vecs = [], []
            for vid, emb in zip(pdf["vec_id"], pdf["embedding"]):
                v = np.asarray(emb, dtype=np.float32)
                rng = np.random.default_rng([seed, int(vid)])
                delta = rng.standard_normal(len(v)).astype(np.float32)
                delta *= noise * np.linalg.norm(v) / max(np.linalg.norm(delta), 1e-9)
                out_ids.append(int(vid) + 1_000_000)
                out_vecs.append(v + delta)
            yield pd.DataFrame({"vec_id": pd.array(out_ids, dtype="int64"), "embedding": out_vecs})

    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    clones = base.repartition(8, "vec_id").mapInPandas(
        perturb, "vec_id long, embedding array<float>"
    )
    return base.unionByName(clones).withColumn("nrm", norm_expr("embedding"))


def planted_clones_sql(
    spark: SparkSession, sf_dir: str, amplitude: float = 0.08
) -> DataFrame:
    """Deterministic ANSI-reproducible clone planting: clone_i = v_i *
    (1 + amplitude * ((i % 7) - 3) / 3) — pure rational double arithmetic
    (multiply/divide/add are IEEE-exact in both Spark and DuckDB, unlike
    transcendental PRNG noise), so a DuckDB oracle can regenerate the exact
    same vectors and the LSH path can be value-checked against brute force.
    Coordinate-wise scaling in [1-amplitude, 1+amplitude] gives
    cos(v, clone) ≈ 1/sqrt(1 + amplitude²·4/9) ≈ 0.9986 at 0.08.
    Embeddings are cast to double up front (float→double is exact)."""
    base = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        )
    )
    factor = lambda i: F.lit(1.0) + F.lit(amplitude) * (
        (i % 7) - 3
    ).cast("double") / F.lit(3.0)
    clones = base.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x, i: x * factor(i)).alias("embedding"),
    )
    return base.unionByName(clones).withColumn("nrm", norm_expr("embedding"))


# ---------- scale path: signed-random-projection LSH ----------

def srp_params(dim: int, bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng([seed, 0x5E9])
    return rng.standard_normal((dim, bits))


def make_srp_udf(dim: int, bits: int, seed: int):
    planes = srp_params(dim, bits, seed)
    shifts = np.arange(bits, dtype=np.uint64)

    @F.pandas_udf("long")
    def srp_sig(embs: pd.Series) -> pd.Series:
        M = np.vstack(embs.to_numpy())  # (batch, dim) — cache-sized batches
        signs = (M @ planes) > 0  # (batch, bits)
        packed = (signs.astype(np.uint64) << shifts).sum(axis=1, dtype=np.uint64)
        return pd.Series(packed.view(np.int64))

    return srp_sig


def srp_candidate_pairs(
    spark: SparkSession, sf_dir: str, config: DedupConfig, threshold: float = 0.95
) -> DataFrame:
    return srp_pairs_from_df(load_embeddings(spark, sf_dir), config, threshold)


def srp_pairs_from_df(
    e: DataFrame, config: DedupConfig, threshold: float = 0.95
) -> DataFrame:
    """Hyperplane-LSH bucketed near-neighbor pairs, verified by exact cosine.

    sign-agreement probability = 1 - angle/pi, so cosine >= 0.95 (angle
    <= 18°) ⇒ per-bit agreement ≈ 0.9. 8-bit pigeonhole chunks give bucket
    recall 1-(1-0.9^8)^8 ≈ 0.99 per pair; buckets stay bounded via the
    shared skew-aware pair generator, and exact-cosine verification keeps
    precision at 1 (bucket collisions never merge). LSH-bucketing is the
    scale path for *near-duplicate* vectors; weakly-similar pairs
    (cos << 0.9) need the brute-force/IVF paths instead.

    e: (vec_id, embedding, nrm).
    """
    dim = len(e.select("embedding").head()["embedding"])
    srp = make_srp_udf(dim, 64, config.seed)
    sigs = e.select(
        F.col("vec_id").cast("string").alias("conv_id"),
        "embedding",
        "nrm",
        srp("embedding").alias("simhash"),
    )
    from .candidates import bucket_pairs

    chunks = chunk_table(sigs.select("conv_id", "simhash"), config, n_chunks=8)
    pairs = bucket_pairs(chunks, ["chunk_id", "chunk_val"], config)
    v = sigs.select(
        F.col("conv_id"), F.col("embedding"), F.col("nrm")
    )
    joined = (
        pairs.join(
            v.select(
                F.col("conv_id").alias("a"),
                F.col("embedding").alias("va"),
                F.col("nrm").alias("na"),
            ),
            "a",
        ).join(
            v.select(
                F.col("conv_id").alias("b"),
                F.col("embedding").alias("vb"),
                F.col("nrm").alias("nb"),
            ),
            "b",
        )
    )
    cos = F.round(dot_expr("va", "vb") / (F.col("na") * F.col("nb")), 6).alias("cos")
    # bucket pairs are canonicalized by *string* conv_id order; restore
    # numeric (a < b) order after casting back to vector ids
    la, lb = F.col("a").cast("long"), F.col("b").cast("long")
    return (
        joined.select(
            F.least(la, lb).alias("a"),
            F.greatest(la, lb).alias("b"),
            cos,
        )
        .filter(F.col("cos") >= threshold)
    )
