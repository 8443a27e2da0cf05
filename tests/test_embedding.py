"""Embedding similarity tests: brute-force cosine vs numpy oracle, SRP-LSH
recall vs brute force."""

from __future__ import annotations

import os

import numpy as np
import pytest

from dedup.config import DedupConfig
from dedup.embedding import cosine_pairs, knn_topk

SF_DIR = "/root/testdata/sf0.001"
needs_data = pytest.mark.skipif(
    not os.path.exists(SF_DIR), reason="driver testdata absent"
)


def _numpy_cosine_pairs(sf_dir: str, threshold: float) -> set[tuple[int, int]]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    M = np.vstack(t["embedding"].to_pylist()).astype(np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    S = M @ M.T
    out = set()
    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            if round(S[i, j], 6) >= threshold:
                out.add((int(ids[i]), int(ids[j])))
    return out


@needs_data
def test_cosine_pairs_match_numpy(spark):
    # driver embeddings are near-orthogonal (max cos ≈ 0.48): threshold 0.3
    truth = _numpy_cosine_pairs(SF_DIR, 0.30)
    got = {(r["a"], r["b"]) for r in cosine_pairs(spark, SF_DIR, 0.30).collect()}
    assert got == truth
    assert truth, "expected some >=0.3 pairs in the embeddings fixture"


@needs_data
def test_knn_topk_consistent(spark):
    got = knn_topk(spark, SF_DIR, k=3).collect()
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r["q"], []).append(r)
    n_vecs = len(by_q)
    assert all(len(v) == 3 for v in by_q.values())
    # ranks are 1..3 and cos is non-increasing within each query
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rows] == [1, 2, 3]
        assert rows[0]["cos"] >= rows[1]["cos"] >= rows[2]["cos"]
    assert n_vecs == 500


@needs_data
def test_srp_lsh_recall_on_planted_dupes(spark, config):
    from dedup.embedding import planted_near_dupes, srp_pairs_from_df

    e = planted_near_dupes(spark, SF_DIR, noise=0.1)
    got = {
        (r["a"], r["b"]) for r in srp_pairs_from_df(e, config, 0.95).collect()
    }
    # noise 0.1 ⇒ cos(v, v+δ) ≈ 1/sqrt(1.01) ≈ 0.995 per planted clone
    planted = {(i, i + 1_000_000) for i in range(500)}
    hits = planted & got
    assert len(hits) >= 0.95 * len(planted), f"LSH recall {len(hits)/len(planted)}"
    # exact-cosine verification: nothing below threshold survives
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    M = np.vstack(t["embedding"].to_pylist()).astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    for a, b in list(got - planted)[:50]:
        if a < 500 and b < 500:
            assert round(float(Mn[a] @ Mn[b]), 6) >= 0.95
