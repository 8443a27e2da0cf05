"""Structured Streaming ingest (SURVEY.md §2.9; spec is batch-first, this
closes the streaming story on top of the same engine).

`readStream` over the transcript directory → `foreachBatch` → each
micro-batch runs the incremental idempotent merge
(incremental.merge_with_prior) against the promoted state, then *promotes*
O(batch)-sized deltas: the state is a manifest of append-only parquet parts
per stage (docs/features/exact_groups/clusters/quarantine), and a batch
appends only its own part directories — bytes written per micro-batch scale
with the batch, never with the corpus (round-2's full
`prior.unionByName(new)` rewrite was O(corpus) write amplification per
batch). Readers union the parts; per-conv precedence (highest part sequence
wins) makes later parts supersede earlier rows, which is what lets
compaction re-open conversations without rewriting history. The pointer
file `_current.json` is atomically replaced, so a crashed promotion is
invisible and a re-delivered batch resumes its materialized stages
idempotently.

Input contract: each input file holds whole conversations (a conversation's
turns never straddle files). Spark's file source assigns whole files to
micro-batches, so reassembly always sees complete conversations. Turns for
an already-promoted conv_id (clustered or quarantined) arriving later are
idempotently skipped — the reference's "seen" semantics — and the skipped
ids are appended to the manifest's dirty list. Conversations that genuinely
grow across drains are handled by `compact_reopen`: a maintenance pass that
finds conversations whose reassembled text changed and re-clusters exactly
the clusters they touch (O(changed + touched), not O(corpus)).
`stream_dedup(auto_compact=True)` runs it after every drain scoped to the
dirty list, so growth never needs a manual maintenance call.

First micro-batch bootstraps with the full batch pipeline; later batches
run the one-sided incremental merge (prior corpus never re-paired).
"""

from __future__ import annotations

import json
import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .config import DedupConfig
from .incremental import PriorState, merge_with_prior
from .io import TRANSCRIPT_SCHEMA
from .pipeline import run_pipeline
from .reassemble import reassemble

_STAGES = ("docs", "features", "exact_groups", "clusters", "quarantine")


def _pointer_path(stream_dir: str) -> str:
    return f"{stream_dir}/_current.json"


def current_state(stream_dir: str) -> dict | None:
    p = _pointer_path(stream_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        manifest = json.load(f)
    # "dirty" (conv_ids skipped as already-seen — compaction triggers) was
    # added after the first manifest format; default it for older states
    manifest.setdefault("parts", {}).setdefault("dirty", [])
    missing = [s for s in _STAGES if s not in manifest["parts"]]
    if missing or "config_fp" not in manifest:
        # a legacy manifest would otherwise surface as an opaque
        # KeyError('docs') deep inside _prior_state (ADVICE r3)
        raise ValueError(
            f"stream state in {stream_dir} was written by an older engine "
            f"version (manifest missing {missing + ([] if 'config_fp' in manifest else ['config_fp'])}); "
            "it cannot be resumed — re-bootstrap into a fresh --stream-dir"
        )
    return manifest


def _check_config(manifest: dict, config: DedupConfig, stream_dir: str) -> None:
    """Cluster state is config-bound (BASELINE.json:14): refuse to merge a
    batch under a different shingle/signature config than the state was
    bootstrapped with. The fingerprint lives in the manifest itself (ADVICE
    r3: the CLI-side _config_fp file only guarded the CLI path)."""
    if manifest["config_fp"] != config.fingerprint:
        raise ValueError(
            f"stream state in {stream_dir} was bootstrapped with config "
            f"{manifest['config_fp']}; this merge is {config.fingerprint}. "
            "Cluster assignments are config-bound — use a new stream_dir or "
            "rerun with the original parameters."
        )


def _set_current(stream_dir: str, manifest: dict) -> None:
    p = _pointer_path(stream_dir)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, p)  # atomic: a torn promotion never becomes current


def _read_parts(
    spark: SparkSession, parts: list, latest_by: str | None = None
) -> DataFrame:
    """Union the part directories; with `latest_by`, keep only each key's
    row from the highest-sequence part (later parts supersede earlier)."""
    dfs = [
        spark.read.parquet(d).drop("_part_id").withColumn("_seq", F.lit(int(s)))
        for d, s in parts
    ]
    df = reduce(lambda a, b: a.unionByName(b), dfs)
    if latest_by:
        w = Window.partitionBy(latest_by).orderBy(F.desc("_seq"))
        df = (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    return df.drop("_seq")


def _prior_state(spark: SparkSession, manifest: dict) -> PriorState:
    parts = manifest["parts"]
    return PriorState(
        docs=_read_parts(spark, parts["docs"], latest_by="conv_id"),
        features=_read_parts(spark, parts["features"], latest_by="conv_id"),
        groups=_read_parts(spark, parts["exact_groups"], latest_by="conv_id"),
        clusters=_read_parts(spark, parts["clusters"], latest_by="conv_id").filter(
            F.col("cluster_id").isNotNull()  # NULL = compaction tombstone
        ),
    )


def _promote_deltas(
    stream_dir: str,
    manifest: dict,
    out: dict,
    stage_map: dict[str, str],
    extra_cluster_parts: list[str] = (),
) -> dict:
    """Append this merge's delta part directories to the manifest (O(batch)
    bytes — the stages were already materialized by the merge's RunState)."""
    state = out["state"]
    seq = int(manifest["seq"]) + 1
    for target, stage in stage_map.items():
        manifest["parts"][target].append([state.stage_path(stage), seq])
    for path in extra_cluster_parts:
        manifest["parts"]["clusters"].append([path, seq])
    manifest["seq"] = seq
    return manifest


def process_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    stream_dir: str,
    config: DedupConfig,
) -> None:
    """foreachBatch body (also directly callable for tests/backfills)."""
    if batch_df.isEmpty():
        return  # availableNow can emit empty planning batches
    os.makedirs(stream_dir, exist_ok=True)
    manifest = current_state(stream_dir)
    if manifest is None:
        run_id = f"cur_{batch_id}"
        run_pipeline(spark, batch_df, config, stream_dir, run_id)
        base = f"{stream_dir}/{run_id}"
        manifest = {
            "batch_id": batch_id,
            "seq": 0,
            "config_fp": config.fingerprint,
            "parts": {**{s: [[f"{base}/{s}", 0]] for s in _STAGES}, "dirty": []},
        }
        _set_current(stream_dir, manifest)
        return
    _check_config(manifest, config, stream_dir)
    prior = _prior_state(spark, manifest)
    out = merge_with_prior(
        spark,
        batch_df,
        prior,
        config,
        stream_dir,
        run_id=f"incr_{batch_id}",
    )
    manifest = _promote_deltas(
        stream_dir,
        manifest,
        out,
        {
            "docs": "incr_docs",
            "features": "incr_features",
            "exact_groups": "incr_exact_delta",
            "clusters": "incr_clusters_delta",
            "quarantine": "incr_quarantine",
            # skipped already-seen conv_ids: O(batch) compaction triggers
            "dirty": "incr_seen_skipped",
        },
    )
    manifest["batch_id"] = batch_id
    _set_current(stream_dir, manifest)


def stream_dedup(
    spark: SparkSession,
    input_dir: str,
    stream_dir: str,
    config: DedupConfig,
    max_files_per_trigger: int | None = None,
    await_termination: bool = True,
    auto_compact: bool = False,
):
    """Run the streaming dedup over a transcript file directory.

    Uses trigger(availableNow): drains everything currently present as one
    or more micro-batches (bounded by max_files_per_trigger) and stops —
    re-invoke (or switch to a processing-time trigger) for continuous
    operation. The streaming checkpoint (offsets/commits) lives under
    stream_dir/_checkpoint; the dedup state under stream_dir/cur_*,
    stream_dir/incr_*, pointed to by stream_dir/_current.json.

    With `auto_compact`, a scoped `compact_reopen` runs after the drain:
    conversations whose turns were skipped as already-seen during any
    micro-batch (the manifest's dirty list) are content-hash-diffed against
    the promoted docs, and the ones that actually grew are re-clustered —
    no full-input scan when nothing was skipped, no manual maintenance call
    to reach batch equivalence for conversations that straddle drains.
    """
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(input_dir)

    # validate BEFORE starting the query: raising after q.start() would
    # leave the drain running while the caller sees a failure (ADVICE r3)
    if auto_compact and not await_termination:
        raise ValueError("auto_compact requires await_termination=True")

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        process_batch(spark, batch_df, int(batch_id), stream_dir, config)

    q = (
        src.writeStream.foreachBatch(fn)
        .option("checkpointLocation", f"{stream_dir}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
        if auto_compact:
            compact_reopen(spark, input_dir, stream_dir, config, scope="dirty")
    return q


def current_clusters(spark: SparkSession, stream_dir: str) -> DataFrame:
    cur = current_state(stream_dir)
    if cur is None:
        raise ValueError(f"no completed streaming state in {stream_dir}")
    return _read_parts(spark, cur["parts"]["clusters"], latest_by="conv_id").filter(
        F.col("cluster_id").isNotNull()
    )


def current_docs(spark: SparkSession, stream_dir: str) -> DataFrame:
    """The promoted document table (latest row per conversation, ambiguous
    flag included) — what a downstream training-data consumer joins the
    cluster assignment against."""
    cur = current_state(stream_dir)
    if cur is None:
        raise ValueError(f"no completed streaming state in {stream_dir}")
    return _read_parts(spark, cur["parts"]["docs"], latest_by="conv_id")


def current_quarantine(spark: SparkSession, stream_dir: str) -> DataFrame:
    cur = current_state(stream_dir)
    if cur is None:
        raise ValueError(f"no completed streaming state in {stream_dir}")
    return _read_parts(spark, cur["parts"]["quarantine"]).dropDuplicates(
        ["conv_id", "turn_idx", "reason"]
    )


def dirty_conversations(spark: SparkSession, stream_dir: str) -> DataFrame:
    """Distinct conv_ids whose turns were skipped as already-seen since the
    last compaction — the pending compaction triggers."""
    cur = current_state(stream_dir)
    if cur is None:
        raise ValueError(f"no completed streaming state in {stream_dir}")
    parts = cur["parts"]["dirty"]
    if not parts:
        return spark.createDataFrame([], "conv_id string")
    return _read_parts(spark, parts).distinct()


def compact_reopen(
    spark: SparkSession,
    input_dir: str,
    stream_dir: str,
    config: DedupConfig,
    scope: str = "full",
) -> int:
    """Re-open conversations whose turn set changed since promotion.

    The streaming contract skips turns for already-promoted conv_ids; a
    conversation whose turns straddled two drains is therefore clustered on
    its first-seen prefix. This maintenance pass re-reads the input
    directory (batch), reassembles the FULL turn set, diffs the document
    hash against the promoted docs, and re-clusters exactly the clusters
    the changed conversations belong to: all members of a touched cluster
    are logically removed from the prior view and re-ingested through the
    same incremental merge, so intra-cluster edges regenerate from the
    (deterministic) features and any new cross-cluster matches are found
    against the remaining reps. Work and bytes written scale with
    O(changed + touched members), not O(corpus).

    scope="full" diffs every conversation in the input (catches drift from
    any source). scope="dirty" diffs only the manifest's dirty list — the
    conv_ids some batch actually skipped — so the reassembly+hash probe
    reads O(dirty) conversations instead of the whole input; with an empty
    dirty list it returns immediately without touching the input. Both
    scopes clear the dirty list on completion.

    Returns the number of re-opened conversations (0 = state already
    consistent).
    """
    manifest = current_state(stream_dir)
    if manifest is None:
        raise ValueError(f"no completed streaming state in {stream_dir}")
    _check_config(manifest, config, stream_dir)
    dirty_parts = manifest["parts"]["dirty"]
    if scope == "dirty" and not dirty_parts:
        return 0
    prior = _prior_state(spark, manifest)

    # The stream is at-least-once: a redelivered file leaves byte-identical
    # rows in the input dir. Those are delivery duplicates and must collapse
    # — but only ACROSS files: byte-identical duplicate rows WITHIN one file
    # are the W2 duplicate-turn ambiguity (a micro-batch sees them as two
    # rows and quarantines the conversation), so compaction must reproduce
    # each row at its maximum per-file multiplicity, not at 1 (ADVICE r3: a
    # blanket dropDuplicates() silently re-clustered such conversations,
    # breaking one-shot equivalence).
    raw = (
        spark.read.schema(TRANSCRIPT_SCHEMA)
        .parquet(input_dir)
        .withColumn("_f", F.input_file_name())
    )
    cols = [f.name for f in TRANSCRIPT_SCHEMA.fields]
    turns = (
        raw.groupBy(*cols, "_f")
        .agg(F.count("*").alias("_m_file"))
        .groupBy(*cols)
        .agg(F.max("_m_file").alias("_m"))
        .select(*cols, F.explode(F.expr("sequence(1, _m)")).alias("_i"))
        .drop("_i")
    )
    nullsafe = turns.filter(
        F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull()
    )
    # the hash probe reads only the candidate scope; the re-ingest below
    # must stay unrestricted (a touched cluster member need not be dirty)
    probe = nullsafe
    if scope == "dirty":
        dirty_ids = _read_parts(spark, dirty_parts).distinct()
        probe = nullsafe.join(dirty_ids, "conv_id", "left_semi")
    fresh = reassemble(probe).select(
        "conv_id", F.xxhash64("doc_text").alias("_h_new")
    )
    prior_h = prior.docs.select("conv_id", F.xxhash64("doc_text").alias("_h_old"))
    changed = (
        fresh.join(prior_h, "conv_id")
        .filter(F.col("_h_new") != F.col("_h_old"))
        .select("conv_id")
    )
    touched_cids = (
        prior.clusters.join(changed, "conv_id", "left_semi")
        .select("cluster_id")
        .distinct()
    )
    touched_members = prior.clusters.join(
        touched_cids, "cluster_id", "left_semi"
    ).select("conv_id")
    reopen = changed.unionByName(touched_members).distinct().localCheckpoint()
    n_reopen = reopen.count()
    if n_reopen == 0:
        if dirty_parts:  # triggers were pure redeliveries — consumed
            manifest["parts"]["dirty"] = []
            _set_current(stream_dir, manifest)
        return 0

    view = PriorState(
        docs=prior.docs.join(reopen, "conv_id", "left_anti"),
        features=prior.features.join(reopen, "conv_id", "left_anti"),
        groups=prior.groups.join(reopen, "conv_id", "left_anti"),
        clusters=prior.clusters.join(reopen, "conv_id", "left_anti"),
    )
    out = merge_with_prior(
        spark,
        nullsafe.join(reopen, "conv_id", "left_semi"),
        view,
        config,
        stream_dir,
        run_id=f"compact_{int(manifest['seq']) + 1}",
    )
    # tombstones: a re-opened conversation that ended up quarantined
    # (ambiguous after the full re-read) must not resurrect its stale
    # cluster row via part precedence — a NULL cluster_id at higher seq
    # masks it (readers filter NULLs after latest-wins)
    tombs = out["state"].materialize(
        "compact_tombstones",
        lambda: reopen.join(
            out["clusters"].select("conv_id"), "conv_id", "left_anti"
        ).select("conv_id", F.lit(None).cast("string").alias("cluster_id")),
    )
    del tombs
    manifest = _promote_deltas(
        stream_dir,
        manifest,
        out,
        {
            "docs": "incr_docs",
            "features": "incr_features",
            "exact_groups": "incr_exact_delta",
            "clusters": "incr_clusters_delta",
            "quarantine": "incr_quarantine",
        },
        extra_cluster_parts=[out["state"].stage_path("compact_tombstones")],
    )
    manifest["parts"]["dirty"] = []  # triggers consumed by this compaction
    _set_current(stream_dir, manifest)
    return n_reopen
