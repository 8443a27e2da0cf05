"""Recall evaluation at configurable scale: run the full pipeline on an
N-conversation synthetic corpus and score dup-pair recall against the
brute-force exact-shingle-Jaccard oracle (the binding >=0.99 gate,
BASELINE.json:2,14) — plus verified-pair precision.

Usage: PYTHONPATH=. python tools/recall_eval.py [n_convs] [seed]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from dedup.config import DedupConfig
from dedup.fixtures import gen_transcripts
from dedup.metrics import cluster_pair_recall
from dedup.pipeline import run_pipeline
from dedup.session import build_session

from tests.oracle import truth_for_texts


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
    truth_pairs, truth_clusters = truth_for_texts(
        texts, cfg.k_shingle, cfg.jaccard_threshold
    )
    truth_df = spark.createDataFrame(
        list(truth_clusters.items()), "conv_id string, cluster_id string"
    )
    recall = cluster_pair_recall(out["clusters"], truth_df)

    # precision of the jaccard-verified pairs (must be 1.0 by construction)
    truth_set = {(a, b) for a, b, _ in truth_pairs}
    vj = [
        (r["a"], r["b"])
        for r in out["verified"].filter("source = 'jaccard'").collect()
    ]
    precision = sum(p in truth_set for p in vj) / max(len(vj), 1)

    print(
        json.dumps(
            {
                "n_convs": n_convs,
                "seed": seed,
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
