"""IVF coarse-quantizer tests: centroid training, clone recovery (recall
on true near-dups), weak-similarity recall vs the brute-force oracle on a
clustered fixture, and pair blocking."""

from __future__ import annotations

import numpy as np
import pytest

from dedup.embedding import norm_expr, planted_clones_sql
from dedup.ivf import ivf_knn, ivf_pairs, train_centroids

SF_DIR = "/root/testdata/sf0.001"


def _clustered_vectors(n_clusters=8, per_cluster=40, dim=32, seed=3):
    """Well-separated gaussian bundles: true neighbors share a bundle."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for ci, c in enumerate(centers):
        pts = c + 0.15 * rng.standard_normal((per_cluster, dim))
        for j, p in enumerate(pts):
            rows.append((ci * per_cluster + j, ci, p.astype(np.float32)))
    return rows


def test_train_centroids_recovers_separated_clusters():
    rows = _clustered_vectors()
    x = np.stack([r[2] for r in rows])
    cents = train_centroids(x, k=8, n_iter=15)
    assert cents.shape == (8, 32)
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0, atol=1e-9)
    # every true bundle center is close to some learned centroid
    true = np.stack(
        [x[i * 40 : (i + 1) * 40].mean(axis=0) for i in range(8)]
    )
    true /= np.linalg.norm(true, axis=1, keepdims=True)
    best = (true @ cents.T).max(axis=1)
    assert best.min() > 0.95


@pytest.fixture(scope="module")
def clustered_df(spark):
    rows = [
        (int(vid), list(map(float, vec)))
        for vid, _, vec in _clustered_vectors()
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df.withColumn("nrm", norm_expr("embedding")).localCheckpoint()


def test_ivf_knn_weak_similarity_recall(spark, clustered_df):
    """recall@5 vs brute force on clustered data — the weak-similarity use
    case hyperplane LSH cannot serve (within-bundle cos ~0.9, cross ~0)."""
    from pyspark.sql import Window, functions as F
    from dedup.embedding import dot_expr

    e = clustered_df
    l = e.select(F.col("vec_id").alias("q"), F.col("embedding").alias("vq"), F.col("nrm").alias("nq"))
    r = e.select(F.col("vec_id").alias("n"), F.col("embedding").alias("vn"), F.col("nrm").alias("nn"))
    cos = F.round(dot_expr("vq", "vn") / (F.col("nq") * F.col("nn")), 6).alias("cos")
    w = Window.partitionBy("q").orderBy(F.desc("cos"), F.asc("n"))
    truth = {
        (row["q"], row["n"])
        for row in l.crossJoin(r)
        .filter(F.col("q") != F.col("n"))
        .select("q", "n", cos)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .collect()
    }
    got = {
        (row["q"], row["n"])
        for row in ivf_knn(e, k=5, n_cells=8, nprobe=2, n_iter=15).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.95, f"IVF recall@5 {recall:.3f}"


def test_ivf_knn_recovers_planted_clones(spark):
    """Every planted clone (cos ≈ 0.9986 to its base, everything else
    ≤ ~0.5) must be the IVF top-1 of its base."""
    e = planted_clones_sql(spark, SF_DIR)
    top1 = ivf_knn(e, k=1, n_cells=16, nprobe=4).collect()
    n_base = e.count() // 2
    got = {r["q"]: r["n"] for r in top1}
    hits = sum(1 for vid in range(n_base) if got.get(vid) == vid + 1_000_000)
    assert hits / n_base >= 0.99, f"clone top-1 recall {hits}/{n_base}"


def test_ivf_pairs_finds_clone_pairs(spark):
    e = planted_clones_sql(spark, SF_DIR)
    n_base = e.count() // 2
    pairs = {
        (r["a"], r["b"])
        for r in ivf_pairs(e, threshold=0.95, n_cells=16, nprobe=2).collect()
    }
    expected = {(vid, vid + 1_000_000) for vid in range(n_base)}
    missed = expected - pairs
    assert len(missed) <= 0.01 * n_base, f"missed {len(missed)} clone pairs"
    # precision is exact by construction (cosine verify), never below threshold
    assert all(p in expected for p in pairs)


def test_centroid_cache_bounded(spark, clustered_df):
    """ADVICE r3: the centroid cache is LRU-bounded — a long-lived session
    training against many (plan, params) keys cannot grow it without
    limit."""
    from dedup import ivf

    ivf._CENTROID_CACHE.clear()
    e = clustered_df.select("vec_id", "embedding")
    for seed in range(ivf._CENTROID_CACHE_MAX + 3):
        ivf.trained_centroids(e, n_cells=4, n_iter=2, seed=seed, max_sample=64)
    assert len(ivf._CENTROID_CACHE) == ivf._CENTROID_CACHE_MAX
