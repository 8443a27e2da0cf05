"""Incremental dedup: idempotent set-at-a-time ingest (SURVEY.md §2.3 J6,
§2.7 U2; reference semantics BASELINE.json:6 — "per-event hash lookup:
insert if new / skip if seen", generalized to near-dup clustering).

Given the prior state (docs/features/exact_groups/clusters DataFrames) and a
new batch of turns:

 1. left-anti join drops conversations already promoted — clustered or
    quarantined ("seen" skip); the skipped ids are materialized as
    `seen_skipped` so streaming can trigger a scoped compaction for
    conversations that grew;
 2. the new conversations are featurized with the *same config fingerprint*
    (refused otherwise — cluster assignments are config-bound);
 3. candidates are generated among new convs AND between new convs and the
    prior exact/near representatives (one-sided join — the prior corpus is
    never re-paired against itself);
 4. verified edges ∪ assignment edges of *touched* prior clusters feed
    connected components. Only clusters reachable from a new edge can
    change, so CC input is O(new edges + touched members), not O(corpus) —
    untouched assignments pass through unchanged. Cluster ids keep the
    deterministic min-member rule (a newly ingested smaller conv_id renames
    its cluster; prior members participate via assignment edges).

Besides the full merged tables, delta outputs (`exact_delta`,
`clusters_delta` — rows added or changed by this batch) are materialized so
a caller maintaining append-only state (streaming.py) writes O(batch),
never O(corpus), per merge.
"""

from __future__ import annotations

from dataclasses import dataclass

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


@dataclass
class PriorState:
    """Prior corpus state a merge builds on. `docs` must carry the
    `ambiguous` flag (quarantined conversations are present but excluded
    from features/exact/clusters, matching the batch pipeline's policy)."""

    docs: DataFrame      # (conv_id, doc_text, n_turns, n_chars, ambiguous, norm_text)
    features: DataFrame  # featurize() output for non-ambiguous docs
    groups: DataFrame    # (conv_id, exact_rep)
    clusters: DataFrame  # (conv_id, cluster_id)


def load_prior_state(
    spark: SparkSession, run_dir: str, run_id: str, config: DedupConfig
) -> PriorState:
    """PriorState from a completed pipeline/merge run directory; refuses a
    config-fingerprint mismatch (cluster assignments are config-bound,
    BASELINE.json:14)."""
    prior = RunState(spark, run_dir, run_id, config)
    for stage in ("docs", "features", "exact_groups", "clusters"):
        if not prior.is_done(stage):
            raise ValueError(
                f"prior run {run_id} missing stage '{stage}' at the "
                "current config fingerprint — incremental merge is "
                "config-bound (BASELINE.json:14)"
            )

    def rd(stage: str) -> DataFrame:
        return spark.read.parquet(prior.stage_path(stage)).drop("_part_id")

    return PriorState(
        docs=rd("docs"),
        features=rd("features"),
        groups=rd("exact_groups"),
        clusters=rd("clusters"),
    )


def merge_with_prior(
    spark: SparkSession,
    new_turns: DataFrame,
    prior: PriorState,
    config: DedupConfig,
    run_dir: str,
    run_id: str = "incr",
) -> dict[str, DataFrame]:
    prior_docs = prior.docs
    prior_features = prior.features
    prior_groups = prior.groups
    prior_clusters = prior.clusters

    state = RunState(spark, run_dir, run_id, config)

    # 1. seen-skip: conversations already promoted — clustered OR
    # quarantined (prior docs carry both) — are dropped idempotently.
    # Skipping on docs rather than clusters matters for quarantined convs:
    # reprocessing just their late-arriving turns would reassemble a
    # suffix-only document and supersede the promoted full-prefix row.
    prior_seen = prior_docs.select("conv_id")

    def build_docs() -> DataFrame:
        fresh = new_turns.filter(
            F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull()
        ).join(prior_seen, "conv_id", "left_anti")
        return reassemble(fresh).withColumn("norm_text", normalize_text("doc_text"))

    new_docs_all = state.materialize("incr_docs", build_docs)
    new_docs = new_docs_all.filter(~F.col("ambiguous"))

    # the skipped conv_ids are the compaction trigger: any of them MAY have
    # grown (redelivery vs growth is settled later by a content-hash diff,
    # streaming.compact_reopen) — O(batch) rows, appended to the state's
    # dirty list by the streaming promoter
    seen_skipped = state.materialize(
        "incr_seen_skipped",
        lambda: new_turns.filter(F.col("conv_id").isNotNull())
        .select("conv_id")
        .distinct()
        .join(prior_seen, "conv_id", "left_semi"),
    )

    # quarantine (same policy as pipeline.py: null keys + ambiguous turn
    # order) — batch 0 and batch N handle bad rows identically
    def build_quarantine() -> DataFrame:
        null_rows = new_turns.filter(
            F.col("conv_id").isNull() | F.col("turn_idx").isNull()
        ).select("conv_id", "turn_idx", F.lit("null_key").alias("reason"))
        amb = new_docs_all.filter(F.col("ambiguous")).select(
            "conv_id",
            F.lit(None).cast("int").alias("turn_idx"),
            F.lit("ambiguous_turn_order").alias("reason"),
        )
        return null_rows.unionByName(amb)

    quarantine = state.materialize("incr_quarantine", build_quarantine)

    new_features = state.materialize(
        "incr_features", lambda: featurize(new_docs, config)
    )

    # 2. exact collapse across new ∪ prior-representative doc texts.
    # Only the DELTA is materialized: rows whose conv_id or exact_rep is a
    # new conv — i.e. the new convs themselves plus any prior rep whose
    # group was taken over by a smaller new id (its self-rep row must be
    # superseded or it would stay a representative). O(batch + matches),
    # never O(reps): appended over the prior table with latest-row-wins
    # precedence it reconstructs exactly the full recomputed groups.
    prior_reps = prior_groups.filter(F.col("conv_id") == F.col("exact_rep")).select("conv_id")

    def build_exact_delta() -> DataFrame:
        union_docs = new_docs.select("conv_id", F.col("norm_text").alias("doc_text")).unionByName(
            prior_docs.join(prior_reps, "conv_id", "left_semi").select(
                "conv_id", F.col("norm_text").alias("doc_text")
            )
        )
        groups = exact.exact_groups(union_docs)
        new_ids_ = new_docs.select("conv_id")
        return (
            groups.join(new_ids_, "conv_id", "left_semi")
            .unionByName(
                groups.join(
                    new_ids_.withColumnRenamed("conv_id", "exact_rep"),
                    "exact_rep",
                    "left_semi",
                ).select("conv_id", "exact_rep")
            )
            .dropDuplicates(["conv_id"])
        )

    exact_delta = state.materialize("incr_exact_delta", build_exact_delta)

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

    # 4. merge: CC over new edges + assignment edges of TOUCHED clusters
    # only. Every new edge endpoint is a new conv or a prior rep, so any
    # cluster that can change is semi-join-reachable from the endpoints;
    # untouched assignments pass through verbatim (and are never re-written
    # — only the re-assigned scope is materialized). This keeps the CC
    # input AND the bytes written O(batch + touched members), which is what
    # lets a 10^12-turn corpus absorb a small batch cheaply.
    def build_reassigned() -> DataFrame:
        new_edges = (
            verified.select("a", "b")
            .unionByName(exact.exact_pairs(exact_delta))
            .dropDuplicates(["a", "b"])
        )
        endpoints = (
            new_edges.select(F.col("a").alias("conv_id"))
            .unionByName(new_edges.select(F.col("b").alias("conv_id")))
            .distinct()
        )
        touched_cids = (
            prior_clusters.join(endpoints, "conv_id", "left_semi")
            .select("cluster_id")
            .distinct()
        )
        touched_members = prior_clusters.join(touched_cids, "cluster_id", "left_semi")
        prior_edges = touched_members.filter(
            F.col("conv_id") != F.col("cluster_id")
        ).select(
            F.least("conv_id", "cluster_id").alias("a"),
            F.greatest("conv_id", "cluster_id").alias("b"),
        )
        edges = new_edges.unionByName(prior_edges).dropDuplicates(["a", "b"])
        assignment, _ = connected_components(edges, config)
        scope = (
            new_docs.select("conv_id")
            .unionByName(touched_members.select("conv_id"))
            .distinct()
        )
        return scope.join(assignment, "conv_id", "left").select(
            "conv_id", F.coalesce("cluster_id", "conv_id").alias("cluster_id")
        )

    reassigned = state.materialize("incr_reassigned", build_reassigned)

    # delta: rows added or renamed by this batch (what an append-only state
    # needs to write); full clusters = prior rows not superseded ∪ reassigned
    def build_clusters_delta() -> DataFrame:
        pc = prior_clusters.select(
            "conv_id", F.col("cluster_id").alias("_prior_cid")
        )
        return (
            reassigned.join(pc, "conv_id", "left")
            .filter(
                F.col("_prior_cid").isNull()
                | (F.col("_prior_cid") != F.col("cluster_id"))
            )
            .select("conv_id", "cluster_id")
        )

    clusters_delta = state.materialize("incr_clusters_delta", build_clusters_delta)
    clusters = prior_clusters.join(
        reassigned.select("conv_id"), "conv_id", "left_anti"
    ).unionByName(reassigned)
    state.flush_metrics()
    return {
        "new_docs": new_docs,
        "new_docs_all": new_docs_all,
        "new_features": new_features,
        "quarantine": quarantine,
        "candidates": cands,
        "verified": verified,
        "exact_delta": exact_delta,
        "clusters": clusters,
        "clusters_delta": clusters_delta,
        "seen_skipped": seen_skipped,
        "state": state,  # type: ignore[dict-item]
    }


def merge_new_conversations(
    spark: SparkSession,
    new_turns: DataFrame,
    prior_run_dir: str,
    prior_run_id: str,
    config: DedupConfig,
    run_dir: str,
    run_id: str = "incr",
) -> dict[str, DataFrame]:
    """Back-compat entry point: prior state read from a completed run dir."""
    prior = load_prior_state(spark, prior_run_dir, prior_run_id, config)
    return merge_with_prior(spark, new_turns, prior, config, run_dir, run_id)
