"""Incremental dedup: idempotent set-at-a-time ingest (SURVEY.md §2.3 J6,
§2.7 U2; reference semantics BASELINE.json:6 — "per-event hash lookup:
insert if new / skip if seen", generalized to near-dup clustering).

Given a completed prior run (its state dir holds docs/features/clusters
stage tables) and a new batch of turns:

 1. left-anti join drops conversations already assigned ("seen" skip);
 2. the new conversations are featurized with the *same config fingerprint*
    (refused otherwise — cluster assignments are config-bound);
 3. candidates are generated among new convs AND between new convs and the
    prior exact/near representatives (one-sided join — the prior corpus is
    never re-paired against itself);
 4. verified edges ∪ prior assignment edges feed connected components, so
    new members land in existing clusters; cluster ids keep the
    deterministic min-member rule (a newly ingested smaller conv_id renames
    its cluster, prior members keep participating via assignment edges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import exact
from .candidates import bucket_pairs, canonical_pairs
from .cc import connected_components
from .config import DedupConfig
from .features import featurize
from .minhash import band_table
from .normalize import normalize_text
from .reassemble import reassemble
from .simhash import chunk_table
from .state import RunState
from .verify import verify_jaccard


def merge_new_conversations(
    spark: SparkSession,
    new_turns: DataFrame,
    prior_run_dir: str,
    prior_run_id: str,
    config: DedupConfig,
    run_dir: str,
    run_id: str = "incr",
) -> dict[str, DataFrame]:
    prior = RunState(spark, prior_run_dir, prior_run_id, config)
    for stage in ("docs", "features", "exact_groups", "clusters"):
        if not prior.is_done(stage):
            raise ValueError(
                f"prior run {prior_run_id} missing stage '{stage}' at the "
                "current config fingerprint — incremental merge is "
                "config-bound (BASELINE.json:14)"
            )
    prior_docs = spark.read.parquet(prior.stage_path("docs")).drop("_part_id")
    prior_features = spark.read.parquet(prior.stage_path("features")).drop("_part_id")
    prior_clusters = spark.read.parquet(prior.stage_path("clusters")).drop("_part_id")

    state = RunState(spark, run_dir, run_id, config)

    # 1. seen-skip: conversations already clustered are dropped idempotently
    def build_docs() -> DataFrame:
        fresh = new_turns.filter(
            F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull()
        ).join(prior_clusters.select("conv_id"), "conv_id", "left_anti")
        return reassemble(fresh).withColumn("norm_text", normalize_text("doc_text"))

    new_docs_all = state.materialize("incr_docs", build_docs)
    new_docs = new_docs_all.filter(~F.col("ambiguous"))

    new_features = state.materialize(
        "incr_features", lambda: featurize(new_docs, config)
    )

    # 2. exact collapse across new ∪ prior-representative doc texts
    prior_groups = spark.read.parquet(prior.stage_path("exact_groups")).drop("_part_id")
    prior_reps = prior_groups.filter(F.col("conv_id") == F.col("exact_rep")).select("conv_id")

    def build_exact() -> DataFrame:
        union_docs = new_docs.select("conv_id", F.col("norm_text").alias("doc_text")).unionByName(
            prior_docs.join(prior_reps, "conv_id", "left_semi").select(
                "conv_id", F.col("norm_text").alias("doc_text")
            )
        )
        return exact.exact_groups(union_docs)

    groups = state.materialize("incr_exact", build_exact)

    # 3. candidates: one-sided — only pairs touching at least one new conv
    new_ids = new_docs.select("conv_id")

    def one_sided(pairs: DataFrame) -> DataFrame:
        touches_new = pairs.join(new_ids.withColumnRenamed("conv_id", "a"), "a", "left_semi").unionByName(
            pairs.join(new_ids.withColumnRenamed("conv_id", "b"), "b", "left_semi")
        )
        return canonical_pairs(touches_new)

    all_features = new_features.unionByName(
        prior_features.join(prior_reps, "conv_id", "left_semi")
    )

    def build_cands() -> DataFrame:
        mh = bucket_pairs(
            band_table(all_features.select("conv_id", "sig"), config),
            ["band_id", "band_hash"],
            config,
        )
        sh = bucket_pairs(
            chunk_table(all_features.select("conv_id", "simhash"), config),
            ["chunk_id", "chunk_val"],
            config,
            payload_cols=["simhash"],
        ).filter(
            F.bit_count(F.col("simhash_a").bitwiseXOR(F.col("simhash_b")))
            <= config.hamming_d
        )
        sf = bucket_pairs(
            all_features.select(
                "conv_id", F.explode_outer("suffix_fps").alias("fp")
            ).filter(F.col("fp").isNotNull()),
            ["fp"],
            config,
        )
        near = one_sided(mh.select("a", "b").unionByName(sh.select("a", "b")))
        sub = one_sided(sf.select("a", "b"))
        return near.withColumn("src", F.lit("near")).unionByName(
            sub.withColumn("src", F.lit("substring"))
        )

    cands = state.materialize("incr_cands", build_cands)

    def build_verified() -> DataFrame:
        from .verify import verify_substring

        union_docs = new_docs.select("conv_id", "norm_text").unionByName(
            prior_docs.join(prior_reps, "conv_id", "left_semi").select(
                "conv_id", "norm_text"
            )
        )
        vj = verify_jaccard(
            cands.filter(F.col("src") == "near").select("a", "b"),
            all_features,
            config,
        ).select("a", "b")
        vs = verify_substring(
            cands.filter(F.col("src") == "substring").select("a", "b"),
            union_docs,
            config,
        ).select("a", "b")
        return vj.unionByName(vs).dropDuplicates(["a", "b"])

    verified = state.materialize("incr_verified", build_verified)

    # 4. merge: new verified edges + exact edges + prior assignment edges
    def build_clusters() -> DataFrame:
        prior_edges = prior_clusters.filter(
            F.col("conv_id") != F.col("cluster_id")
        ).select(F.col("conv_id").alias("a"), F.col("cluster_id").alias("b"))
        edges = (
            verified.select("a", "b")
            .unionByName(exact.exact_pairs(groups))
            .unionByName(prior_edges)
            .dropDuplicates(["a", "b"])
        )
        assignment, _ = connected_components(edges, config)
        everyone = prior_clusters.select("conv_id").unionByName(
            new_docs.select("conv_id")
        )
        return (
            everyone.join(assignment, "conv_id", "left")
            .select(
                "conv_id", F.coalesce("cluster_id", "conv_id").alias("cluster_id")
            )
        )

    clusters = state.materialize("incr_clusters", build_clusters)
    state.flush_metrics()
    return {
        "new_docs": new_docs,
        "new_features": new_features,
        "candidates": cands,
        "verified": verified,
        "clusters": clusters,
        "state": state,  # type: ignore[dict-item]
    }
