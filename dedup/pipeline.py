"""End-to-end dedup pipeline (SURVEY.md §3.1).

Stage graph (each stage materialized via state.RunState → resumable,
lineage-tracked, plan-tree-bounded):

  read → valid_turns/quarantine → docs (reassemble + normalize)
       → features (shingles, MinHash sig, SimHash, suffix fingerprints)
       → exact_groups  (identical-normalized-text collapse — skew fast path)
       → candidates: minhash-LSH ∥ simhash-Hamming ∥ suffix-windows
         (near-dup paths run on exact representatives only)
       → verified pairs (exact shingle-Jaccard / true shared-run length)
       → edges (verified ∪ exact) → connected components → clusters

Replaces the reference's per-event FastAPI/Postgres hash lookup
(BASELINE.json:6) with set-at-a-time batch stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import exact
from .candidates import bucket_pairs
from .cc import connected_components
from .config import DedupConfig
from .minhash import band_table, make_minhash_udf
from .normalize import normalize_text
from .reassemble import reassemble, split_valid
from .shingle import make_shingle_udf
from .simhash import hamming_candidates, simhash64
from .state import RunState
from .suffix import make_suffix_udf, suffix_candidates
from .verify import verify_jaccard, verify_substring


def run_pipeline(
    spark: SparkSession,
    turns: DataFrame,
    config: DedupConfig,
    run_dir: str,
    run_id: str = "run",
    fail_after: str | None = None,  # test hook: die after this stage (resume test)
) -> dict[str, DataFrame]:
    state = RunState(spark, run_dir, run_id, config)

    def check_fail(stage: str) -> None:
        if fail_after == stage:
            state.flush_metrics()
            raise RuntimeError(f"injected failure after stage {stage}")

    valid = state.materialize("valid_turns", lambda: split_valid(turns)[0])
    state.materialize("quarantine", lambda: split_valid(turns)[1])
    check_fail("valid_turns")

    def build_docs() -> DataFrame:
        return reassemble(valid).withColumn("norm_text", normalize_text("doc_text"))

    docs = state.materialize("docs", build_docs)
    check_fail("docs")

    def build_features() -> DataFrame:
        shingle_udf = make_shingle_udf(config.k_shingle)
        minhash_udf = make_minhash_udf(config)
        suffix_udf = make_suffix_udf(config)
        feat = docs.select(
            "conv_id",
            shingle_udf("norm_text").alias("shingles"),
            suffix_udf("norm_text").alias("suffix_fps"),
        )
        # second select so sig/simhash reuse the computed shingles column
        return feat.select(
            "conv_id",
            "shingles",
            "suffix_fps",
            minhash_udf("shingles").alias("sig"),
            simhash64("shingles").alias("simhash"),
        )

    features = state.materialize("features", build_features)
    check_fail("features")

    groups = state.materialize(
        "exact_groups",
        lambda: exact.exact_groups(docs.select("conv_id", F.col("norm_text").alias("doc_text"))),
    )
    check_fail("exact_groups")

    reps = groups.filter(F.col("conv_id") == F.col("exact_rep")).select("conv_id")
    rep_features = features.join(reps, "conv_id", "left_semi")

    cand_minhash = state.materialize(
        "cand_minhash",
        lambda: bucket_pairs(
            band_table(rep_features.select("conv_id", "sig"), config),
            ["band_id", "band_hash"],
            config,
        ),
    )
    cand_simhash = state.materialize(
        "cand_simhash",
        lambda: hamming_candidates(
            rep_features.select("conv_id", "simhash"), config
        ),
    )
    cand_suffix = state.materialize(
        "cand_suffix",
        lambda: suffix_candidates(
            rep_features.select("conv_id", "suffix_fps"), config
        ),
    )
    check_fail("candidates")

    def build_verified() -> DataFrame:
        near = (
            cand_minhash.select("a", "b")
            .unionByName(cand_simhash.select("a", "b"))
            .dropDuplicates(["a", "b"])
        )
        vj = verify_jaccard(near, features, config).select(
            "a", "b", "jaccard", F.lit("jaccard").alias("source")
        )
        vs = verify_substring(
            cand_suffix.select("a", "b"),
            docs.select("conv_id", "norm_text"),
            config,
        ).select(
            "a",
            "b",
            F.lit(None).cast("double").alias("jaccard"),
            F.lit("substring").alias("source"),
        )
        return vj.unionByName(vs).dropDuplicates(["a", "b"])

    verified = state.materialize("verified", build_verified)
    check_fail("verified")

    def build_edges() -> DataFrame:
        return (
            verified.select("a", "b")
            .unionByName(exact.exact_pairs(groups))
            .dropDuplicates(["a", "b"])
        )

    edges = state.materialize("edges", build_edges)

    def build_clusters() -> DataFrame:
        assignment, _rounds = connected_components(
            edges.select("a", "b"), config
        )
        return (
            docs.select("conv_id")
            .join(assignment, "conv_id", "left")
            .select(
                "conv_id",
                F.coalesce("cluster_id", "conv_id").alias("cluster_id"),
            )
        )

    clusters = state.materialize("clusters", build_clusters)
    state.flush_metrics()

    return {
        "valid_turns": valid,
        "docs": docs,
        "features": features,
        "exact_groups": groups,
        "cand_minhash": cand_minhash,
        "cand_simhash": cand_simhash,
        "cand_suffix": cand_suffix,
        "verified": verified,
        "edges": edges,
        "clusters": clusters,
        "state": state,  # type: ignore[dict-item]
    }
