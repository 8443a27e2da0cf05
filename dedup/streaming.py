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
an already-clustered conv_id arriving later are idempotently skipped — the
reference's "seen" semantics. Conversations that genuinely grow across
drains are handled by `compact_reopen`: a maintenance pass that re-reads
the input, finds conversations whose reassembled text changed, and
re-clusters exactly the clusters they touch (O(changed + touched), not
O(corpus)).

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
        return json.load(f)


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
            "parts": {s: [[f"{base}/{s}", 0]] for s in _STAGES},
        }
        _set_current(stream_dir, manifest)
        return
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
):
    """Run the streaming dedup over a transcript file directory.

    Uses trigger(availableNow): drains everything currently present as one
    or more micro-batches (bounded by max_files_per_trigger) and stops —
    re-invoke (or switch to a processing-time trigger) for continuous
    operation. The streaming checkpoint (offsets/commits) lives under
    stream_dir/_checkpoint; the dedup state under stream_dir/cur_*,
    stream_dir/incr_*, pointed to by stream_dir/_current.json.
    """
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(input_dir)

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
    return q


def current_clusters(spark: SparkSession, stream_dir: str) -> DataFrame:
    cur = current_state(stream_dir)
    if cur is None:
        raise ValueError(f"no completed streaming state in {stream_dir}")
    return _read_parts(spark, cur["parts"]["clusters"], latest_by="conv_id").filter(
        F.col("cluster_id").isNotNull()
    )


def current_quarantine(spark: SparkSession, stream_dir: str) -> DataFrame:
    cur = current_state(stream_dir)
    if cur is None:
        raise ValueError(f"no completed streaming state in {stream_dir}")
    return _read_parts(spark, cur["parts"]["quarantine"]).dropDuplicates(
        ["conv_id", "turn_idx", "reason"]
    )


def compact_reopen(
    spark: SparkSession,
    input_dir: str,
    stream_dir: str,
    config: DedupConfig,
) -> int:
    """Re-open conversations whose turn set changed since promotion.

    The streaming contract skips turns for already-clustered conv_ids; a
    conversation whose turns straddled two drains is therefore clustered on
    its first-seen prefix. This maintenance pass re-reads the input
    directory (batch), reassembles every conversation's FULL turn set,
    diffs the document hash against the promoted docs, and re-clusters
    exactly the clusters those changed conversations belong to: all members
    of a touched cluster are logically removed from the prior view and
    re-ingested through the same incremental merge, so intra-cluster edges
    regenerate from the (deterministic) features and any new cross-cluster
    matches are found against the remaining reps. Work and bytes written
    scale with O(changed + touched members), not O(corpus).

    Returns the number of re-opened conversations (0 = state already
    consistent; nothing written).
    """
    manifest = current_state(stream_dir)
    if manifest is None:
        raise ValueError(f"no completed streaming state in {stream_dir}")
    prior = _prior_state(spark, manifest)

    turns = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(input_dir)
    nullsafe = turns.filter(
        F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull()
    )
    fresh = reassemble(nullsafe).select(
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
        return 0

    view = PriorState(
        docs=prior.docs.join(reopen, "conv_id", "left_anti"),
        features=prior.features.join(reopen, "conv_id", "left_anti"),
        groups=prior.groups.join(reopen, "conv_id", "left_anti"),
        clusters=prior.clusters.join(reopen, "conv_id", "left_anti"),
    )
    out = merge_with_prior(
        spark,
        turns.join(reopen, "conv_id", "left_semi"),
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
    _set_current(stream_dir, manifest)
    return n_reopen
