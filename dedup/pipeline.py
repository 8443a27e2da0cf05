"""End-to-end dedup pipeline (SURVEY.md §3.1).

Stage graph (each stage materialized via state.RunState → resumable,
lineage-tracked, plan-tree-bounded):

  read → docs (validate + reassemble + normalize, one pass) + quarantine
       → features ∥ exact_groups ∥ quarantine (all depend on docs only)
       → candidates: minhash-LSH + simhash-Hamming + suffix-windows fused
         into one exchange (near-dup paths run on exact reps only)
       → verified pairs (exact shingle-Jaccard / true shared-run length)
       → edges (verified ∪ exact) → connected components → clusters

Replaces the reference's per-event FastAPI/Postgres hash lookup
(BASELINE.json:6) with set-at-a-time batch stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import exact
from .candidates import unified_candidates
from .cc import connected_components
from .config import DedupConfig
from .features import featurize
from .normalize import normalize_text
from .reassemble import reassemble
from .state import RunState
from .verify import verify_jaccard, verify_substring


def run_pipeline(
    spark: SparkSession,
    turns: DataFrame,
    config: DedupConfig,
    run_dir: str,
    run_id: str = "run",
    fail_after: str | None = None,  # test hook: die after this stage (resume test)
    mode: str = "parquet",  # "persist": bench/CI fast path (no resume)
) -> dict[str, DataFrame]:
    state = RunState(spark, run_dir, run_id, config, mode=mode)

    def check_fail(stage: str) -> None:
        if fail_after == stage:
            state.flush_metrics()
            raise RuntimeError(f"injected failure after stage {stage}")

    nullsafe = turns.filter(
        F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull()
    )

    def build_docs() -> DataFrame:
        # validation (ambiguous-order detection) + reassembly + normalization
        # in one aggregation pass over the turn set — the only full-input
        # shuffle in the pipeline
        return reassemble(nullsafe).withColumn(
            "norm_text", normalize_text("doc_text")
        )

    docs_all = state.materialize("docs", build_docs)
    docs = docs_all.filter(~F.col("ambiguous"))

    def build_quarantine() -> DataFrame:
        null_rows = turns.filter(
            F.col("conv_id").isNull() | F.col("turn_idx").isNull()
        ).select("conv_id", "turn_idx", F.lit("null_key").alias("reason"))
        amb = docs_all.filter(F.col("ambiguous")).select(
            "conv_id",
            F.lit(None).cast("int").alias("turn_idx"),
            F.lit("ambiguous_turn_order").alias("reason"),
        )
        return null_rows.unionByName(amb)

    # features / exact_groups / quarantine all depend only on docs: run
    # their materializations concurrently so the two small stages hide
    # entirely behind the (much larger) Arrow featurization instead of
    # serializing ~3 barriers after it (matters on real clusters as much as
    # locally — these are otherwise idle task slots)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(3) as pool:
        f_features = pool.submit(
            state.materialize, "features", lambda: featurize(docs, config)
        )
        f_groups = pool.submit(
            state.materialize,
            "exact_groups",
            lambda: exact.exact_groups(
                docs.select("conv_id", F.col("norm_text").alias("doc_text"))
            ),
        )
        f_quarantine = pool.submit(state.materialize, "quarantine", build_quarantine)
        quarantine = f_quarantine.result()
        check_fail("docs")
        features = f_features.result()
        check_fail("features")
        groups = f_groups.result()
    check_fail("exact_groups")

    reps = groups.filter(F.col("conv_id") == F.col("exact_rep")).select("conv_id")
    rep_features = features.join(reps, "conv_id", "left_semi")

    # all three candidate sources in ONE exchange+sort+window pass (see
    # candidates.unified_candidates: three concurrent per-source stages
    # measured ~1.6x 1→4-core scaling from slot contention; one fused stage
    # restores it), tagged by source for the per-source verify semantics
    cands = state.materialize(
        "candidates", lambda: unified_candidates(rep_features, config)
    )
    cand_minhash = cands.filter(F.col("src") == "mh").select("a", "b")
    cand_simhash = cands.filter(F.col("src") == "sh").select("a", "b")
    cand_suffix = cands.filter(F.col("src") == "sf").select("a", "b")
    check_fail("candidates")

    def build_verified() -> DataFrame:
        # Jaccard-verify every candidate in one pass; the (expensive) exact
        # longest-shared-run check only runs for suffix-sourced pairs that
        # fail Jaccard — near-dup clones sharing long runs are already
        # accepted by the cheap JVM-side check.
        suffix_pairs = cand_suffix.select("a", "b")
        all_cand = (
            cand_minhash.select("a", "b")
            .unionByName(cand_simhash.select("a", "b"))
            .unionByName(suffix_pairs)
            .dropDuplicates(["a", "b"])
        )
        vj = (
            verify_jaccard(all_cand, features, config)
            .select("a", "b", "jaccard", F.lit("jaccard").alias("source"))
            .localCheckpoint(eager=False)  # used twice below; cheaper than
            # persist() (no InMemoryRelation canonicalization overhead)
        )
        sub_rest = suffix_pairs.join(vj.select("a", "b"), ["a", "b"], "left_anti")
        vs = verify_substring(
            sub_rest,
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
        "quarantine": quarantine,
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
