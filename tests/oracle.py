"""Brute-force oracle: exact shingle-Jaccard all-pairs + union-find
clustering. This is the "reference clusters" definition for the recall gate
(BASELINE.md: the reference's exact hash semantics generalize to exact
Jaccard at the configured threshold; BASELINE.json:2,14).
"""

from __future__ import annotations

import numpy as np

from dedup.shingle import token_hashes, _shingles_one


def doc_shingles(texts: dict[str, str], k: int) -> dict[str, np.ndarray]:
    return {cid: _shingles_one(token_hashes(t), k) for cid, t in texts.items()}


def all_pairs_jaccard(
    shingles: dict[str, np.ndarray], threshold: float
) -> list[tuple[str, str, float]]:
    ids = sorted(shingles)
    sets = {cid: set(s.tolist()) for cid, s in shingles.items()}
    out = []
    for i, a in enumerate(ids):
        sa = sets[a]
        if not sa:
            continue
        for b in ids[i + 1 :]:
            sb = sets[b]
            if not sb:
                continue
            inter = len(sa & sb)
            if inter == 0:
                continue
            j = inter / (len(sa) + len(sb) - inter)
            if j >= threshold:
                out.append((a, b, j))
    return out


class UnionFind:
    def __init__(self) -> None:
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        if p != x:
            self.parent[x] = self.find(p)
        return self.parent[x]

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            self.parent[hi] = lo


def clusters_from_pairs(
    all_ids: list[str], pairs: list[tuple[str, str]]
) -> dict[str, str]:
    """conv_id -> cluster_id (min member id), singletons map to self."""
    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    # min-id per component
    comp_min: dict[str, str] = {}
    for cid in all_ids:
        root = uf.find(cid)
        comp_min[root] = min(comp_min.get(root, cid), cid)
    return {cid: comp_min[uf.find(cid)] for cid in all_ids}


def truth_for_texts(
    texts: dict[str, str], k: int, threshold: float
) -> tuple[list[tuple[str, str, float]], dict[str, str]]:
    sh = doc_shingles(texts, k)
    pairs = all_pairs_jaccard(sh, threshold)
    clusters = clusters_from_pairs(sorted(texts), [(a, b) for a, b, _ in pairs])
    return pairs, clusters
