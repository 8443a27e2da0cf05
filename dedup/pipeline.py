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


def run_pipeline(
    spark: SparkSession,
    turns: DataFrame,
    config: DedupConfig,
    run_dir: str,
    run_id: str = "run",
    fail_after: str | None = None,  # test hook: die after this stage (resume test)
    mode: str = "parquet",  # "persist": bench/CI fast path (no resume)
    index_stages: bool = False,  # also materialize cand_index/exact_index
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

    # Scale-adaptive planning profile (guide §2: derive partitioning from
    # input size, not a constant). A SMALL run (< 10k docs — maintenance
    # re-clusters, small corpora, the driver's 5k-row documents table) on
    # the corpus-sized session profile pays ~40 near-empty tasks per
    # exchange plus one AQE re-plan job per query stage plus per-plan
    # Janino codegen — pure barrier cost that dominates its wall (the
    # incremental merge has applied the same rule since wave B). Large runs
    # (the real 100 TB shape) keep the session profile untouched. When the
    # input is a plain parquet scan, its footers give an exact row count
    # (an upper bound on doc count) before anything runs, so even the docs
    # stage plans batch-sized; otherwise the profile starts after docs
    # lands. Restored in `finally` (unset keys restore to unset) so a
    # failed run never leaks the small profile into the session.
    from .incremental import _estimate_input_rows

    # both sessions: a streaming bootstrap's `turns` belongs to Structured
    # Streaming's CLONED session, and a plan binds to the conf of the
    # session that created its root (see merge_with_prior)
    confs = [spark.conf]
    try:
        turns_session = turns.sparkSession
        if turns_session is not spark:
            confs.append(turns_session.conf)
    except Exception:
        pass
    saved_conf = [
        {
            k: c.get(k, None)
            for k in (
                "spark.sql.shuffle.partitions",
                "spark.sql.adaptive.enabled",
                "spark.sql.codegen.wholeStage",
            )
        }
        for c in confs
    ]

    def _apply_small(parts: int) -> None:
        for c in confs:
            c.set(
                "spark.sql.shuffle.partitions",
                str(max(1, min(config.shuffle_partitions, parts))),
            )
            c.set("spark.sql.adaptive.enabled", "false")
            c.set("spark.sql.codegen.wholeStage", "false")

    def _restore() -> None:
        for c, saved in zip(confs, saved_conf):
            for k, v in saved.items():
                if v is None:
                    c.unset(k)
                else:
                    c.set(k, v)

    est_turns = _estimate_input_rows(turns)
    applied = est_turns is not None and 0 < est_turns < 10_000
    try:
        if applied:
            _apply_small((est_turns + 4095) // 4096)
        docs_all = state.materialize("docs", build_docs)
        docs = docs_all.filter(~F.col("ambiguous"))
        n_docs = state.rows_of("docs") or 0
        small_run = 0 < n_docs < 10_000
        if small_run:
            _apply_small((n_docs + 63) // 64)
            applied = True
        elif applied:  # estimate misfired (cannot happen: docs <= turns)
            _restore()
            applied = False
        return _run_stages(
            spark, state, turns, config, check_fail, docs_all, docs,
            index_stages,
        )
    finally:
        if applied:
            _restore()


def _run_stages(
    spark: SparkSession,
    state: RunState,
    turns: DataFrame,
    config: DedupConfig,
    check_fail,
    docs_all: DataFrame,
    docs: DataFrame,
    index_stages: bool,
) -> dict[str, DataFrame]:
    """Everything after docs: featurize through clusters (split out so the
    planning-profile save/restore wraps it without re-indenting the stage
    graph)."""

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

    # streaming-bootstrap lookup indexes (candidate bucket keys + exact
    # content hashes of the representatives): they depend only on the
    # stages already landed, so materializing them HERE overlaps their
    # jobs with the candidates→verify→CC chain below (guide §2.6) instead
    # of serializing two more corpus scans after the pipeline finishes —
    # which is what the streaming bootstrap previously did.
    f_indexes: list = []
    if index_stages:
        from concurrent.futures import ThreadPoolExecutor as _TPE

        from .candidates import unified_key_table
        from .incremental import exact_index_rows

        idx_pool = _TPE(2)
        f_indexes = [
            idx_pool.submit(
                state.materialize,
                "cand_index",
                lambda: unified_key_table(rep_features, config),
            ),
            idx_pool.submit(
                state.materialize,
                "exact_index",
                lambda: exact_index_rows(
                    docs.join(reps, "conv_id", "left_semi").select(
                        "conv_id", "norm_text"
                    )
                ),
            ),
        ]

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
        #
        # Single-pass shape: the distinct pair set (with an is-suffix flag
        # aggregated in the same exchange the old dropDuplicates paid)
        # attaches ONE combined (shingles, norm_text) lookup — both sides
        # semi-reduced to pair participants first, so nothing corpus-sized
        # is shuffled — and the per-row accept condition replaces the old
        # verify-jaccard + anti-join + verify-substring + union chain
        # (~half the exchanges, identical accepted rows). The substring UDF
        # sees empty strings except for suffix pairs that failed Jaccard,
        # so only those pay Python compute, exactly as before.
        from .verify import make_substring_verify_udf

        # lazy local checkpoints: all_cand feeds the two semi-join probes
        # AND the pair join, and lookup is referenced for both endpoints —
        # without the checkpoint each reference re-plans (and re-shuffles)
        # the whole subtree, doubling the stage's Exchange count
        all_cand = (
            cands.select("a", "b", (F.col("src") == "sf").alias("_sf"))
            .groupBy("a", "b")
            .agg(F.max("_sf").alias("is_sf"))
            .localCheckpoint(eager=False)
        )
        participants = all_cand.select(
            F.explode(F.array("a", "b")).alias("conv_id")
        ).distinct()
        lookup = (
            features.select("conv_id", "shingles")
            .join(F.broadcast(participants), "conv_id", "left_semi")
            .join(
                docs.select("conv_id", "norm_text").join(
                    F.broadcast(participants), "conv_id", "left_semi"
                ),
                "conv_id",
            )
            .localCheckpoint(eager=False)
        )
        joined = all_cand.join(
            lookup.select(
                F.col("conv_id").alias("a"),
                F.col("shingles").alias("sh_a"),
                F.col("norm_text").alias("t_a"),
            ),
            "a",
        ).join(
            lookup.select(
                F.col("conv_id").alias("b"),
                F.col("shingles").alias("sh_b"),
                F.col("norm_text").alias("t_b"),
            ),
            "b",
        )
        jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
            F.array_union("sh_a", "sh_b")
        )
        jac_ok = F.coalesce(jac >= F.lit(config.jaccard_threshold), F.lit(False))
        need_run = F.col("is_sf") & ~jac_ok
        run_udf = make_substring_verify_udf(config)
        run = run_udf(
            F.when(need_run, F.col("t_a")).otherwise(F.lit("")),
            F.when(need_run, F.col("t_b")).otherwise(F.lit("")),
        )
        # `run` appears ONLY in the filter: referencing a Python-UDF column
        # in both a filter and the output projection makes the optimizer
        # evaluate the UDF twice (guide §4.4); post-filter, the source tag
        # is derivable from jac_ok alone (accepted ∧ ¬jac_ok ⇒ substring)
        accept = jac_ok | (need_run & (run >= F.lit(config.suffix_min_tokens)))
        return joined.filter(accept).select(
            "a",
            "b",
            F.when(jac_ok, jac).alias("jaccard"),
            F.when(jac_ok, "jaccard").otherwise("substring").alias("source"),
        )

    verified = state.materialize("verified", build_verified)
    check_fail("verified")

    def build_edges() -> DataFrame:
        return (
            verified.select("a", "b")
            .unionByName(exact.exact_pairs(groups))
            .dropDuplicates(["a", "b"])
        )

    if state.mode == "persist":
        # persist mode (the timed bench cadence): the only consumer of
        # edges is connected components' bounded edge collect, and the
        # dict consumers downstream read clusters — a lazy lineage cut
        # computes edges inside that collect and caches there, removing
        # one eager checkpoint+count barrier from the critical path.
        # Parquet mode keeps the resumable materialization.
        edges = state.materialize_lazy("edges", build_edges)
    else:
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
    out_indexes = {}
    if f_indexes:
        out_indexes = {
            "cand_index": f_indexes[0].result(),
            "exact_index": f_indexes[1].result(),
        }
        idx_pool.shutdown()
    state.flush_metrics()

    return {
        **out_indexes,
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
