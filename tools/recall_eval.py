"""Recall evaluation at configurable scale: run the full pipeline on an
N-conversation synthetic corpus and score dup-pair recall against the
exact-shingle-Jaccard oracle (the binding >=0.99 gate,
BASELINE.json:2,14) — plus verified-pair precision.

Truth engines (both EXACT; a pair with zero shared shingles cannot reach
any threshold > 0, so shingle-blocked candidate generation loses nothing):
  - python: the original all-pairs scan (tests/oracle.py) — O(n^2) pure
    Python, fine to ~10k conversations;
  - duckdb: shingle-posting self-join + exact Jaccard filter — what makes
    the full sf0.1-scale 20k-conversation corpus tractable (VERDICT r4 #5).
At n <= 2000 both engines run and are asserted identical, so the blocked
path is self-validated against the brute force on every small run.

Usage: PYTHONPATH=. python tools/recall_eval.py [n_convs] [seed]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import tempfile

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd

from dedup.config import DedupConfig
from dedup.fixtures import gen_transcripts
from dedup.metrics import cluster_pair_recall
from dedup.pipeline import run_pipeline
from dedup.session import build_session
from dedup.shingle import _shingles_one, token_hashes

from tests.oracle import clusters_from_pairs, truth_for_texts


def duckdb_truth_pairs(
    texts: dict[str, str], k: int, threshold: float
) -> list[tuple[str, str]]:
    """Exact shingle-Jaccard duplicate pairs via a DuckDB posting-list
    self-join: same shingles as the Python oracle (token_hashes +
    _shingles_one), intersections counted per candidate pair, exact
    J >= threshold filter. Pairs sharing no shingle are (correctly) never
    considered."""
    import duckdb

    cids: list[str] = []
    shs: list[np.ndarray] = []
    sizes: list[tuple[str, int]] = []
    for cid, t in texts.items():
        s = _shingles_one(token_hashes(t), k)
        sizes.append((cid, len(s)))
        if len(s):
            cids.append(cid)
            shs.append(s)
    sh_df = pd.DataFrame(
        {
            "conv_id": np.repeat(
                np.asarray(cids, dtype=object), [len(s) for s in shs]
            ),
            "shingle": np.concatenate(shs) if shs else np.empty(0, np.int64),
        }
    )
    sz_df = pd.DataFrame(sizes, columns=["conv_id", "n"])
    con = duckdb.connect()
    con.register("sh", sh_df)
    con.register("sz", sz_df)
    out = con.execute(
        """
        WITH inter AS (
          SELECT a.conv_id AS a, b.conv_id AS b, COUNT(*)::BIGINT AS i
          FROM sh a JOIN sh b ON a.shingle = b.shingle
                             AND a.conv_id < b.conv_id
          GROUP BY 1, 2
        )
        SELECT p.a, p.b
        FROM inter p
        JOIN sz sa ON sa.conv_id = p.a
        JOIN sz sb ON sb.conv_id = p.b
        WHERE CAST(p.i AS DOUBLE) / (sa.n + sb.n - p.i) >= ?
        """,
        [threshold],
    ).fetchall()
    con.close()
    return [(a, b) for a, b in out]


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    cfg = DedupConfig()
    spark = build_session(master="local[16]", config=cfg)
    turns = gen_transcripts(spark, n_convs, seed=seed, partitions=32)
    run_dir = tempfile.mkdtemp(prefix="recall_eval_")
    out = run_pipeline(spark, turns, cfg, run_dir, "eval")

    texts = {
        r["conv_id"]: r["norm_text"]
        for r in out["docs"].select("conv_id", "norm_text").collect()
    }
    truth_set = {
        tuple(sorted(p))
        for p in duckdb_truth_pairs(texts, cfg.k_shingle, cfg.jaccard_threshold)
    }
    engines = "duckdb"
    if n_convs <= 2000:
        py_pairs, _ = truth_for_texts(texts, cfg.k_shingle, cfg.jaccard_threshold)
        py_set = {tuple(sorted((a, b))) for a, b, _ in py_pairs}
        assert py_set == truth_set, (
            f"blocked DuckDB truth != brute-force truth: "
            f"only_py={len(py_set - truth_set)} only_duck={len(truth_set - py_set)}"
        )
        engines = "duckdb==python"
    truth_clusters = clusters_from_pairs(sorted(texts), sorted(truth_set))
    truth_df = spark.createDataFrame(
        list(truth_clusters.items()), "conv_id string, cluster_id string"
    )
    recall = cluster_pair_recall(out["clusters"], truth_df)

    # precision of the jaccard-verified pairs (must be 1.0 by construction)
    vj = [
        (r["a"], r["b"])
        for r in out["verified"].filter("source = 'jaccard'").collect()
    ]
    precision = sum(tuple(sorted(p)) in truth_set for p in vj) / max(len(vj), 1)

    print(
        json.dumps(
            {
                "n_convs": n_convs,
                "seed": seed,
                "truth_engine": engines,
                "truth_dup_pairs": len(truth_set),
                "recall": round(recall, 6),
                "jaccard_verified_pairs": len(vj),
                "jaccard_precision": round(precision, 6),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
