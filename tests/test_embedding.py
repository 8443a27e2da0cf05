"""Embedding similarity tests: brute-force cosine vs numpy oracle, SRP-LSH
recall vs brute force."""

from __future__ import annotations

import os

import numpy as np
import pytest

from dedup.config import DedupConfig
from dedup.embedding import cosine_pairs, knn_topk, srp_candidate_pairs

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
    truth = _numpy_cosine_pairs(SF_DIR, 0.95)
    got = {(r["a"], r["b"]) for r in cosine_pairs(spark, SF_DIR, 0.95).collect()}
    assert got == truth
    assert truth, "expected some near pairs in the embeddings fixture"


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
def test_srp_lsh_recall(spark, config):
    truth = _numpy_cosine_pairs(SF_DIR, 0.95)
    got = {
        (r["a"], r["b"])
        for r in srp_candidate_pairs(spark, SF_DIR, config, 0.95).collect()
    }
    # exact verification -> precision 1
    assert got <= truth
    # 8-bit pigeonhole buckets -> per-pair recall ~0.99 at cos 0.95
    assert len(got) >= 0.9 * len(truth)
