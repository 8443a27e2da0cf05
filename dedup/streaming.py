"""Structured Streaming ingest (SURVEY.md §2.9; spec is batch-first, this
closes the streaming story on top of the same engine).

`readStream` over the transcript directory → `foreachBatch` → each
micro-batch runs the incremental idempotent merge
(incremental.merge_new_conversations) against the previous batch's state,
then *promotes* the merged result to a full pipeline-shaped state
(docs/features/exact_groups/clusters stage tables + manifests) so the next
micro-batch — or a later batch job, or resume — can consume it. The
foreachBatch pattern is the standard way to run stateful batch logic with
exactly-once sinks under Spark's streaming checkpointing; a pointer file
(atomically replaced) names the current state so a crashed promotion is
invisible.

Input contract: each input file holds whole conversations (a conversation's
turns never straddle files). Spark's file source assigns whole files to
micro-batches, so reassembly always sees complete conversations. Turns for
an already-clustered conv_id arriving later are idempotently skipped — the
reference's "seen" semantics; genuinely growing conversations need a
re-open/compaction pass, which is out of scope here and documented.

First micro-batch bootstraps with the full batch pipeline; later batches
run the one-sided incremental merge (prior corpus never re-paired).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .config import DedupConfig
from .incremental import merge_new_conversations
from .io import TRANSCRIPT_SCHEMA
from .pipeline import run_pipeline
from .state import RunState
from . import exact


def _pointer_path(stream_dir: str) -> str:
    return f"{stream_dir}/_current.json"


def current_state(stream_dir: str) -> dict | None:
    p = _pointer_path(stream_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _set_current(stream_dir: str, run_id: str, batch_id: int) -> None:
    p = _pointer_path(stream_dir)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"run_id": run_id, "batch_id": batch_id}, f)
    os.replace(tmp, p)  # atomic: a torn promotion never becomes current


def _promote(
    spark: SparkSession,
    stream_dir: str,
    batch_id: int,
    config: DedupConfig,
    prior: RunState | None,
    out: dict[str, DataFrame],
) -> str:
    """Write the merged corpus as a full pipeline-shaped state under a new
    run id. docs/features accumulate; exact_groups is recomputed over the
    union (a linear hash-agg — a new smaller conv_id may take over as rep);
    clusters come from the merge."""
    run_id = f"cur_{batch_id}"
    state = RunState(spark, stream_dir, run_id, config)
    if prior is None:
        raise ValueError("promotion requires a prior state")
    prior_docs = spark.read.parquet(prior.stage_path("docs")).drop("_part_id")
    prior_features = spark.read.parquet(prior.stage_path("features")).drop("_part_id")

    docs = state.materialize(
        "docs", lambda: prior_docs.unionByName(out["new_docs"])
    )
    state.materialize(
        "features", lambda: prior_features.unionByName(out["new_features"])
    )
    state.materialize(
        "exact_groups",
        lambda: exact.exact_groups(
            docs.select("conv_id", F.col("norm_text").alias("doc_text"))
        ),
    )
    state.materialize("clusters", lambda: out["clusters"])
    state.flush_metrics()
    return run_id


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
    cur = current_state(stream_dir)
    if cur is None:
        run_id = f"cur_{batch_id}"
        run_pipeline(spark, batch_df, config, stream_dir, run_id)
        _set_current(stream_dir, run_id, batch_id)
        return
    prior = RunState(spark, stream_dir, cur["run_id"], config)
    out = merge_new_conversations(
        spark,
        batch_df,
        stream_dir,
        cur["run_id"],
        config,
        stream_dir,
        run_id=f"incr_{batch_id}",
    )
    run_id = _promote(spark, stream_dir, batch_id, config, prior, out)
    _set_current(stream_dir, run_id, batch_id)


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
    stream_dir/_checkpoint; the dedup state under stream_dir/cur_*.
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
    state_dir = f"{stream_dir}/{cur['run_id']}/clusters"
    return spark.read.parquet(state_dir).drop("_part_id")
