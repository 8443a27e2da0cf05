"""End-to-end pipeline tests: recall >= 0.99 vs the brute-force oracle,
pair-level precision of verification, planted-family behavior, resume,
skew (SURVEY.md §5.4)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dedup.config import DedupConfig
from dedup.fixtures import gen_transcripts, family_of, source_of
from dedup.io import TRANSCRIPT_SCHEMA, documents_as_transcripts
from dedup.metrics import cluster_pair_recall, cluster_summary
from dedup.pipeline import run_pipeline
from dedup.verify import longest_shared_run

from .oracle import truth_for_texts, clusters_from_pairs

N_CONVS = 240


@pytest.fixture(scope="module")
def e2e(spark, tmp_path_factory):
    cfg = DedupConfig(shuffle_partitions=8)
    turns = gen_transcripts(spark, N_CONVS, seed=42, partitions=4)
    run_dir = str(tmp_path_factory.mktemp("e2e"))
    out = run_pipeline(spark, turns, cfg, run_dir, "e2e")
    texts = {
        r["conv_id"]: r["norm_text"]
        for r in out["docs"].select("conv_id", "norm_text").collect()
    }
    truth_pairs, truth_clusters = truth_for_texts(texts, cfg.k_shingle, cfg.jaccard_threshold)
    return cfg, out, texts, truth_pairs, truth_clusters


def test_recall_ge_099(spark, e2e):
    cfg, out, texts, truth_pairs, truth_clusters = e2e
    truth_df = spark.createDataFrame(
        list(truth_clusters.items()), "conv_id string, cluster_id string"
    )
    recall = cluster_pair_recall(out["clusters"], truth_df)
    assert recall >= 0.99, f"dup-pair recall {recall} < 0.99"


def test_verified_jaccard_pairs_are_true(e2e):
    """Verification precision: every pair the pipeline verified via Jaccard
    must truly be >= threshold under brute-force recomputation."""
    cfg, out, texts, truth_pairs, _ = e2e
    truth = {(a, b) for a, b, _ in truth_pairs}
    got = [
        (r["a"], r["b"])
        for r in out["verified"].filter("source = 'jaccard'").collect()
    ]
    assert got and all(p in truth for p in got)


def test_verified_substring_pairs_are_true(e2e):
    cfg, out, texts, *_ = e2e
    rows = out["verified"].filter("source = 'substring'").collect()
    assert rows
    for r in rows:
        assert (
            longest_shared_run(texts[r["a"]], texts[r["b"]], cfg.suffix_window)
            >= cfg.suffix_min_tokens
        )


def test_planted_families(e2e):
    cfg, out, texts, truth_pairs, truth_clusters = e2e
    pred = {
        r["conv_id"]: r["cluster_id"] for r in out["clusters"].collect()
    }
    n = N_CONVS
    for idx in range(n):
        fam = family_of(idx, n)
        cid = f"c{idx:08d}"
        src = f"c{source_of(idx, n):08d}"
        if fam == "exact":
            assert pred[cid] == pred[src], f"exact dup {cid} not clustered with {src}"
        elif fam == "near_lo":
            # below-threshold edits must NOT merge unless truth says so
            if truth_clusters[cid] != truth_clusters[src]:
                assert pred[cid] != pred[src], f"near_lo {cid} wrongly merged with {src}"
    # flood band: all in one cluster
    flood = [f"c{i:08d}" for i in range(int(n * 0.95), n)]
    assert len({pred[c] for c in flood}) == 1
    # substring band: planted pairs share a >=200-token run -> same cluster
    sub_start = int(n * 0.90)
    for i in range(sub_start, int(n * 0.95) - 1, 2):
        a, b = f"c{i:08d}", f"c{i+1:08d}"
        assert pred[a] == pred[b], f"substring pair {a},{b} not merged"


def test_simhash_standalone_catches_fuzzy(spark, e2e):
    """The SimHash path alone must find a nontrivial share of the fuzzy
    family (its raison d'être); the union of paths catches the rest."""
    cfg, out, *_ = e2e
    n = N_CONVS
    fuzzy = {
        tuple(sorted((f"c{i:08d}", f"c{source_of(i, n):08d}")))
        for i in range(int(n * 0.85), int(n * 0.90))
    }
    sim_pairs = {(r["a"], r["b"]) for r in out["cand_simhash"].collect()}
    assert len(fuzzy & sim_pairs) >= len(fuzzy) // 3


def test_cluster_summary_consistency(e2e):
    cfg, out, *_ = e2e
    row = cluster_summary(out["clusters"]).head()
    assert row["n_convs"] == out["clusters"].count()
    assert row["max_cluster"] >= int(N_CONVS * 0.05)  # flood cluster


def test_lineage_and_metrics_tables(e2e):
    cfg, out, *_ = e2e
    state = out["state"]
    m = {r["stage"]: r for r in state.metrics_df().collect()}
    assert "clusters" in m and m["clusters"]["rows_out"] > 0
    lin = state.lineage_df()
    assert lin.filter("stage = 'docs'").agg(F.sum("rows_out")).head()[0] == m["docs"]["rows_out"]


def test_resume_after_failure(spark, tmp_path):
    cfg = DedupConfig(shuffle_partitions=8)
    turns = gen_transcripts(spark, 60, seed=11, partitions=2)
    run_dir = str(tmp_path / "runs")

    with pytest.raises(RuntimeError, match="injected failure"):
        run_pipeline(spark, turns, cfg, run_dir, "r1", fail_after="features")

    out_resumed = run_pipeline(spark, turns, cfg, run_dir, "r1")
    out_fresh = run_pipeline(spark, turns, cfg, run_dir, "r2")

    a = sorted(map(tuple, out_resumed["clusters"].collect()))
    b = sorted(map(tuple, out_fresh["clusters"].collect()))
    assert a == b
    # early stages were skipped on resume
    resumed_stages = {
        r["stage"]
        for r in out_resumed["state"].metrics_df().filter("resumed").collect()
    }
    assert {"docs", "features"} <= resumed_stages


def test_resume_refused_across_config_change(spark, tmp_path):
    cfg = DedupConfig(shuffle_partitions=8)
    turns = gen_transcripts(spark, 40, seed=12, partitions=2, edge_rows=False)
    run_dir = str(tmp_path / "runs")
    run_pipeline(spark, turns, cfg, run_dir, "r1")

    cfg2 = cfg.with_(k_shingle=4)
    out2 = run_pipeline(spark, turns, cfg2, run_dir, "r1")
    # nothing may be reused under a different fingerprint
    assert out2["state"].metrics_df().filter(
        (F.col("config_fp") == cfg2.fingerprint) & F.col("resumed")
    ).count() == 0


def test_skew_flood_no_blowup(spark, tmp_path):
    """1k identical docs: exact pre-collapse keeps LSH quadratics away;
    pipeline completes and yields one flood cluster."""
    import datetime as dt

    ts = dt.datetime(2025, 1, 1)
    hot = [(f"h{i:04d}", 0, "user", "x y z " * 30, None, ts) for i in range(1000)]
    uniq = [(f"u{i}", 0, "user", f"unique doc {i} " + " ".join(f"t{i}{j}" for j in range(20)), None, ts) for i in range(10)]
    turns = spark.createDataFrame(hot + uniq, schema=TRANSCRIPT_SCHEMA)
    cfg = DedupConfig(shuffle_partitions=8, bucket_cap=16)
    out = run_pipeline(spark, turns, cfg, str(tmp_path / "skew"), "skew")
    sizes = {r["cluster_id"]: r["count"] for r in out["clusters"].groupBy("cluster_id").count().collect()}
    assert sizes["h0000"] == 1000
    # candidate volume stayed linear-ish: exact reps collapse the flood
    assert out["cand_minhash"].count() < 5000


def test_tier_assignments_match_planted_families(e2e):
    """Production tier verdicts (dedup/tiers.py) from pipeline outputs:
    planted exact/flood convs land in tier 'exact'; near_hi in >= 'near'
    (they are Jaccard-verified); substring pairs in >= 'substring';
    uniques that no truth pair touches stay 'unique'."""
    from dedup.tiers import tier_assignments, tier_summary

    cfg, out, texts, truth_pairs, truth_clusters = e2e
    tiers = {
        r["conv_id"]: (r["tier_rank"], r["tier"])
        for r in tier_assignments(
            out["docs"], out["exact_groups"], out["verified"]
        ).collect()
    }
    assert len(tiers) == out["docs"].count()
    paired = {c for p in truth_pairs for c in p}
    n = N_CONVS
    for idx in range(n):
        cid = f"c{idx:08d}"
        if cid not in tiers:
            continue  # quarantined
        fam = family_of(idx, n)
        rank, label = tiers[cid]
        if fam in ("exact", "flood"):
            assert label == "exact", (cid, fam, label)
        elif fam == "near_hi":
            assert rank >= 2, (cid, fam, label)
        elif fam == "substring":
            assert rank >= 1, (cid, fam, label)
        elif fam == "unique" and cid not in paired:
            assert label == "unique", (cid, fam, label)
    # exact tier == exactly the >1-size exact groups, and the summary adds up
    from pyspark.sql import functions as F

    group_sizes = out["exact_groups"].groupBy("exact_rep").count()
    n_exact_docs = (
        out["exact_groups"]
        .join(group_sizes.filter(F.col("count") > 1), "exact_rep")
        .count()
    )
    assert sum(1 for r, _ in tiers.values() if r == 3) == n_exact_docs
    summary = {
        r["tier"]: r["n_convs"]
        for r in tier_summary(
            tier_assignments(out["docs"], out["exact_groups"], out["verified"])
        ).collect()
    }
    assert sum(summary.values()) == len(tiers)
