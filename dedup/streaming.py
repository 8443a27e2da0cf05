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

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from .config import DedupConfig
from .incremental import PriorState, merge_with_prior
from .io import TRANSCRIPT_SCHEMA
from .pipeline import run_pipeline
from .reassemble import reassemble

_STAGES = (
    "docs",
    "features",
    "exact_groups",
    "clusters",
    "quarantine",
    # persisted lookup indexes (VERDICT r3 #1): candidate bucket keys
    # (src, k1, k2, conv_id, payload) and exact content hashes
    # (h64, h256, exact_rep) for the promoted representatives — what lets a
    # micro-batch equi-join its own keys against the corpus instead of
    # rebuilding bucket/hash tables over all prior representatives
    "cand_index",
    "exact_index",
)


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


class PartCache:
    """Per-drain cache of part-directory scans (VERDICT r4 #2).

    A drain of K micro-batches re-reads the same base part directories
    K times — and within one micro-batch, the merge's several stage
    materializations each re-scan them again. Part directories are
    immutable once promoted (promotion appends NEW directories; folding
    writes NEW directories), so caching the scan by path is always
    correct; the cache's lifetime just bounds the memory. `stream_dedup`
    holds one cache per drain and releases it when the drain finishes, so
    the per-micro-batch fixed cost pays the parquet read once per drain
    instead of once per action. Executors spill to local disk
    (MEMORY_AND_DISK) — on a real cluster that trades repeated
    object-store reads for local-disk/memory hits.
    """

    def __init__(self) -> None:
        self._dfs: dict[str, DataFrame] = {}
        self._peak_size: int = 0  # high-water mark, for tests/metrics
        # stage -> (parts_key, df, checkpoint_rdd_id | None); see view()
        self._views: dict[str, tuple] = {}
        # stage -> post-drop schema of the first part read: all parts of a
        # stage share one logical schema (modulo the _part_id bookkeeping
        # column, absent from fold parts and dropped either way), so every
        # part after the first reads schema-supplied — a schema-less
        # read.parquet costs one footer-inference Spark job per part
        # directory, ~8 new parts per promoted micro-batch
        self._schemas: dict[str, object] = {}

    def scan(
        self, spark: SparkSession, part_dir: str, stage: str | None = None
    ) -> DataFrame:
        df = self._dfs.get(part_dir)
        if df is None:
            from pyspark import StorageLevel

            schema = self._schemas.get(stage) if stage is not None else None
            if schema is not None:
                # parquet projection tolerates both directions: a file with
                # _part_id ignores the extra column, a file without one has
                # nothing to drop
                df = spark.read.schema(schema).parquet(part_dir)
            else:
                df = spark.read.parquet(part_dir).drop("_part_id")
                if stage is not None:
                    self._schemas[stage] = df.schema
            df = df.persist(StorageLevel.MEMORY_AND_DISK)
            self._dfs[part_dir] = df
            self._peak_size = max(self._peak_size, len(self._dfs))
        return df

    def view(
        self, stage: str, parts_key: tuple, build, incremental=None
    ) -> DataFrame:
        """Memoize a FLATTENED (localCheckpoint-ed) state view per batch.

        A latest-by view is a window over the K-part union. Consumers that
        probe it on the window's own partition key (conv_id) push their
        broadcast semi-join below the window, so the scan is pruned to the
        batch — cheap at any scale. But a consumer keyed on a DIFFERENT
        column (the merge's touched-cluster lookup joins clusters on
        cluster_id) cannot push below a conv_id-partitioned window, so
        every such job re-evaluates the full union+window. Flattening the
        view once per batch (lineage cut, blocks in the block store)
        replaces several full-state window evaluations per micro-batch with
        exactly one — strictly fewer O(state) passes at every scale. Keyed
        by the part list: a new promotion invalidates (and unpersists) the
        superseded view, so at most one copy per stage is ever held.

        `incremental(prev_df, new_parts) -> DataFrame`: when the new part
        list EXTENDS the cached one (pure appends at higher seqs — the
        promotion fast path; folding replaces the list and misses), the
        next flatten composes the cached view with only the appended
        O(batch) parts instead of re-running the full K-part union+window —
        the per-micro-batch flatten job goes from O(state) to O(state scan
        + delta window), with the window over delta rows only.
        """
        entry = self._views.get(stage)
        if entry is not None and entry[0] == parts_key:
            return entry[1]
        src = None
        if (
            entry is not None
            and incremental is not None
            and len(parts_key) > len(entry[0])
            and parts_key[: len(entry[0])] == entry[0]
        ):
            appended = list(parts_key[len(entry[0]):])
            prev_seqs = [int(s) for _, s in entry[0]]
            new_seqs = [int(s) for _, s in appended]
            # appended parts must all be newer than everything flattened
            # into the cached view, or latest-wins cannot be composed
            if min(new_seqs) > max(prev_seqs):
                src = incremental(entry[1], appended)
        # eager-checkpoint the successor BEFORE unpersisting the old view:
        # the incremental composition reads the old (lineage-truncated)
        # blocks, which are unrecomputable once unpersisted
        target = src if src is not None else build()
        sc = target.sparkSession.sparkContext
        try:
            sc.setJobDescription(f"view:{stage}" + (":incr" if src is not None else ":full"))
            df = target.localCheckpoint(eager=True)
        finally:
            sc.setJobDescription(None)
        if entry is not None:
            self._unpersist_view(entry)
        rdd_id = None
        try:
            # the persisted RDD is the analyzed plan's LogicalRDD (df.rdd
            # would be a derived deserialization RDD) — same idiom as
            # RunState._persist_stage
            rdd_id = df._jdf.queryExecution().analyzed().rdd().id()
        except Exception:
            pass
        self._views[stage] = (parts_key, df, rdd_id)
        return df

    @staticmethod
    def _unpersist_view(entry: tuple) -> None:
        _, df, rdd_id = entry
        if rdd_id is None:
            return
        try:
            jmap = df.sparkSession.sparkContext._jsc.getPersistentRDDs()
            jrdd = jmap.get(rdd_id)
            if jrdd is not None:
                jrdd.unpersist(False)
        except Exception:
            pass

    def release(self) -> None:
        for df in self._dfs.values():
            df.unpersist()
        self._dfs.clear()
        for entry in self._views.values():
            self._unpersist_view(entry)
        self._views.clear()


def _read_parts(
    spark: SparkSession,
    parts: list,
    latest_by: str | list | None = None,
    cache: PartCache | None = None,
    stage: str | None = None,
) -> DataFrame:
    """Union the part directories; with `latest_by` (a key column or list of
    key columns), keep only each key's row from the highest-sequence part
    (later parts supersede earlier).

    Precedence never shuffles the corpus: the lowest-seq group (the
    corpus-sized base) takes ONE broadcast anti-join against the key union
    of every delta part, and the deltas — all batch-sized by construction
    (streaming promotes O(batch) parts) — are flattened with one row_number
    window that exchanges only delta rows. A window over the whole union
    would re-shuffle the full corpus on every micro-batch's prior-state
    read, which at 10^12 turns is the difference between a scan and a sort
    of the world. Equally important, the plan stays O(K) in the part count:
    the previous per-level anti-join chain (each level anti-joined against
    the accumulated distinct keys of all newer levels) built an O(K^2) plan
    with K nested distinct exchanges, and Catalyst re-analysis of that
    shape made per-micro-batch cost GROW with drain length — measured 10s
    -> 55s per batch by part 9, flat after this rewrite. Parts sharing one
    seq are key-disjoint by construction (a compaction's merge delta and
    its tombstones), so the window is tie-free.
    """
    dfs = [
        (
            int(s),
            cache.scan(spark, d, stage=stage)
            if cache is not None
            else spark.read.parquet(d).drop("_part_id"),
        )
        for d, s in parts
    ]
    if not latest_by:
        return reduce(lambda a, b: a.unionByName(b), [df for _, df in dfs])
    keys = [latest_by] if isinstance(latest_by, str) else list(latest_by)
    by_seq: dict[int, DataFrame] = {}
    for s, df in dfs:
        by_seq[s] = by_seq[s].unionByName(df) if s in by_seq else df
    seqs = sorted(by_seq)
    base = by_seq[seqs[0]]
    if len(seqs) == 1:
        return base
    delta_union = reduce(
        lambda a, b: a.unionByName(b),
        [by_seq[s].withColumn("_seq", F.lit(s)) for s in seqs[1:]],
    )
    w = Window.partitionBy(*keys).orderBy(F.col("_seq").desc())
    flat_deltas = (
        delta_union.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_seq")
    )
    live_base = base.join(
        F.broadcast(delta_union.select(*keys)), keys, "left_anti"
    )
    return live_base.unionByName(flat_deltas)


def _prior_state(
    spark: SparkSession, manifest: dict, cache: PartCache | None = None
) -> PriorState:
    parts = manifest["parts"]

    def build_clusters() -> DataFrame:
        return _read_parts(
            spark, parts["clusters"], latest_by="conv_id", cache=cache,
            stage="clusters",
        ).filter(
            F.col("cluster_id").isNotNull()  # NULL = compaction tombstone
        )

    def compose_clusters(prev: DataFrame, appended: list) -> DataFrame:
        # latest-wins against the cached flat view: the appended parts are
        # strictly newer, so their rows supersede; NULL cluster_id at the
        # newer seq tombstones the conv out of the view entirely
        delta = _read_parts(
            spark, appended, latest_by="conv_id", cache=cache, stage="clusters"
        )
        return prev.join(
            F.broadcast(delta.select("conv_id")), "conv_id", "left_anti"
        ).unionByName(delta.filter(F.col("cluster_id").isNotNull()))

    # clusters is the one view whose hot consumer joins on cluster_id — a
    # key the conv_id-partitioned latest-by window can't let a semi-join
    # push below — so without flattening, every touched-cluster lookup
    # re-evaluates the full union+window (measured 10x the flattened cost
    # at 9 parts). docs/features/exact_index are probed on their own window
    # keys, so their scans stay pruned-by-pushdown and uncheckpointed.
    clusters = (
        cache.view(
            "clusters",
            tuple(tuple(p) for p in parts["clusters"]),
            build_clusters,
            incremental=compose_clusters,
        )
        if cache is not None
        else build_clusters()
    )
    return PriorState(
        docs=_read_parts(
            spark, parts["docs"], latest_by="conv_id", cache=cache, stage="docs"
        ),
        features=_read_parts(
            spark, parts["features"], latest_by="conv_id", cache=cache,
            stage="features",
        ),
        groups=_read_parts(
            spark, parts["exact_groups"], latest_by="conv_id", cache=cache,
            stage="exact_groups",
        ),
        clusters=clusters,
        # append-only: a conversation's keys never change while promoted
        # (re-opened convs re-append; their old rows only yield extra
        # candidates that fail verification)
        cand_index=_read_parts(
            spark, parts["cand_index"], cache=cache, stage="cand_index"
        ),
        exact_index=_read_parts(
            spark, parts["exact_index"], latest_by=["h64", "h256"], cache=cache,
            stage="exact_index",
        ).filter(F.col("exact_rep").isNotNull()),  # NULL = compaction tombstone
    )


# a stage's part list is folded into one part once it exceeds this many
# entries: reads stay one base anti-join + one delta-sized window, but the
# delta union (and the broadcast key set) must not grow unboundedly with
# drain count (VERDICT r3 #2)
MAX_PARTS_PER_STAGE = 16

# per-stage latest-wins keys for folding (None = row-level dedup)
_FOLD_KEYS = {
    "docs": ["conv_id"],
    "features": ["conv_id"],
    "exact_groups": ["conv_id"],
    "clusters": ["conv_id"],
    "exact_index": ["h64", "h256"],
}


def fold_parts(
    spark: SparkSession,
    stream_dir: str,
    threshold: int = MAX_PARTS_PER_STAGE,
    manifest: dict | None = None,
    cache: PartCache | None = None,
) -> dict[str, int]:
    """Fold any stage whose part list exceeds `threshold` into ONE part.

    The latest-wins view (tombstones applied, so NULL-masked rows drop out
    entirely — no earlier part remains for them to mask) is written as a new
    part at the current seq and the stage's list is truncated to it; the
    pointer swap stays atomic, and superseded part directories are left in
    place so a concurrent reader of the old pointer never loses files.
    Without this, a long-lived stream pays one broadcast anti-join per
    historical drain on every state read (VERDICT r3 #2). Returns
    {stage: parts_before} for the folded stages.
    """
    own_manifest = manifest is None
    if own_manifest:
        manifest = current_state(stream_dir)
        if manifest is None:
            raise ValueError(f"no completed streaming state in {stream_dir}")
    seq = int(manifest["seq"])
    folded: dict[str, int] = {}
    for stage, parts in manifest["parts"].items():
        if len(parts) <= threshold:
            continue
        if stage in _FOLD_KEYS:
            df = _read_parts(
                spark, parts, latest_by=_FOLD_KEYS[stage], cache=cache, stage=stage
            )
            if stage == "clusters":
                df = df.filter(F.col("cluster_id").isNotNull())
            elif stage == "exact_index":
                df = df.filter(F.col("exact_rep").isNotNull())
        else:  # quarantine / cand_index / dirty: append-only row sets
            df = _read_parts(spark, parts, cache=cache, stage=stage).distinct()
        path = f"{stream_dir}/fold_{seq}_{stage}"
        try:
            spark.sparkContext.setJobDescription(f"fold:{stage}")
            df.write.mode("overwrite").parquet(path)
        finally:
            spark.sparkContext.setJobDescription(None)
        manifest["parts"][stage] = [[path, seq]]
        folded[stage] = len(parts)
    if folded and own_manifest:
        _set_current(stream_dir, manifest)
    return folded


def gc_parts(stream_dir: str) -> int:
    """Delete state directories no longer referenced by the current
    manifest; returns bytes freed.

    Folding and promotion never delete superseded parts (a concurrent
    reader of the old pointer must keep its files), so a long-lived stream
    leaks disk linearly with drain count. This maintenance pass removes:
    fold_* directories not in the manifest, and stage directories inside
    run directories (cur_*/incr_*/compact_*) that are neither referenced as
    parts nor run bookkeeping (_metrics/_lineage/stage manifests stay, so a
    redelivered crashed batch still refuses config mismatches cleanly —
    its unpromoted intermediates just recompute). Call it between drains
    (quiescent state): a batch that crashed after materializing stages but
    before promotion loses only resume work, never promoted data.
    """
    import shutil

    manifest = current_state(stream_dir)
    if manifest is None:
        raise ValueError(f"no completed streaming state in {stream_dir}")
    referenced = {
        os.path.realpath(d)
        for parts in manifest["parts"].values()
        for d, _ in parts
    }

    def _dir_bytes(path: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
        return total

    freed = 0
    for name in sorted(os.listdir(stream_dir)):
        full = os.path.join(stream_dir, name)
        if not os.path.isdir(full):
            continue
        if name.startswith("fold_"):
            if os.path.realpath(full) not in referenced:
                freed += _dir_bytes(full)
                shutil.rmtree(full, ignore_errors=True)
            continue
        if not (
            name.startswith("cur_")
            or name.startswith("incr_")
            or name.startswith("compact_")
        ):
            continue  # _checkpoint and anything unrecognized stay untouched
        for stage_name in sorted(os.listdir(full)):
            stage_dir = os.path.join(full, stage_name)
            if not os.path.isdir(stage_dir) or stage_name.startswith("_"):
                continue  # keep _metrics/_lineage
            if os.path.realpath(stage_dir) not in referenced:
                freed += _dir_bytes(stage_dir)
                shutil.rmtree(stage_dir, ignore_errors=True)
                # drop the stage's done-manifest too: a redelivered crashed
                # batch must recompute the stage, not "resume" from a
                # deleted parquet directory
                try:
                    os.remove(os.path.join(full, f"{stage_name}.manifest.json"))
                except OSError:
                    pass
    return freed


def _batch_rows_from_source_log(stream_dir: str, batch_id: int) -> int | None:
    """Exact row count of a micro-batch from the streaming checkpoint's
    file-source log + parquet footers (driver-side, no Spark jobs).

    foreachBatch DataFrames report no inputFiles() (the batch is an
    internal relation, not a file index), but the file source's WAL at
    _checkpoint/sources/0/<batch_id> lists exactly the files assigned to
    the batch — written before foreachBatch runs. Entries carry batchId,
    so a periodic ``.compact`` log (which replays all history) filters to
    the current batch. Returns None (caller falls back to isEmpty + the
    post-docs profile) on any surprise: non-local paths, missing log,
    unparseable entries."""
    base = f"{stream_dir}/_checkpoint/sources/0/{batch_id}"
    path = base if os.path.exists(base) else base + ".compact"
    if not os.path.exists(path):
        return None
    try:
        import pyarrow.parquet as pq

        total = 0
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("v"):
                    continue
                e = json.loads(line)
                if "batchId" in e and int(e["batchId"]) != int(batch_id):
                    continue
                p = e.get("path", "")
                if p.startswith("file://"):
                    p = p[7:]
                elif p.startswith("file:"):
                    p = p[5:]
                else:
                    return None
                total += pq.read_metadata(p).num_rows
        return total
    except Exception:
        return None


def _promote_deltas(
    stream_dir: str,
    manifest: dict,
    out: dict,
    stage_map: dict[str, str],
    extra_cluster_parts: list[str] = (),
) -> dict:
    """Append this merge's delta part directories to the manifest (O(batch)
    bytes — the stages were already materialized by the merge's RunState).

    Stages that materialized ZERO rows are not appended: an empty part
    contributes nothing to any latest-wins union, but every historical part
    widens every later batch's state-read plan (and its broadcast key set)
    — quarantine and seen_skipped are empty on most healthy batches, so
    skipping them keeps those part lists at their fold-base size for the
    lifetime of the stream."""
    state = out["state"]
    seq = int(manifest["seq"]) + 1
    for target, stage in stage_map.items():
        if state.rows_of(stage) == 0:
            continue  # empty delta: nothing to supersede, nothing to read
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
    fold_threshold: int = MAX_PARTS_PER_STAGE,
    part_cache: PartCache | None = None,
) -> None:
    """foreachBatch body (also directly callable for tests/backfills)."""
    # availableNow can emit empty planning batches; the batch's parquet
    # footers (resolved via the checkpoint's file-source WAL) answer
    # emptiness exactly with zero Spark jobs (isEmpty costs one job per
    # micro-batch), with isEmpty as the non-file fallback
    est_rows = _batch_rows_from_source_log(stream_dir, batch_id)
    if est_rows == 0 or (est_rows is None and batch_df.isEmpty()):
        return
    os.makedirs(stream_dir, exist_ok=True)
    manifest = current_state(stream_dir)
    if manifest is None:
        run_id = f"cur_{batch_id}"
        # index_stages: the lookup indexes (candidate bucket keys + exact
        # content hashes of the representatives — what later batches
        # equi-join instead of rebuilding bucket/hash tables) materialize
        # INSIDE the pipeline, overlapped with its verify/CC tail, rather
        # than as two more serial corpus scans after it returns
        out = run_pipeline(
            spark, batch_df, config, stream_dir, run_id, index_stages=True
        )
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
    prior = _prior_state(spark, manifest, cache=part_cache)
    out = merge_with_prior(
        spark,
        batch_df,
        prior,
        config,
        stream_dir,
        run_id=f"incr_{batch_id}",
        est_rows=est_rows,
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
            "cand_index": "incr_cand_index_delta",
            "exact_index": "incr_exact_index_delta",
            # skipped already-seen conv_ids: O(batch) compaction triggers
            "dirty": "incr_seen_skipped",
        },
    )
    manifest["batch_id"] = batch_id
    fold_parts(spark, stream_dir, fold_threshold, manifest, cache=part_cache)
    _set_current(stream_dir, manifest)


def stream_dedup(
    spark: SparkSession,
    input_dir: str,
    stream_dir: str,
    config: DedupConfig,
    max_files_per_trigger: int | None = None,
    await_termination: bool = True,
    auto_compact: bool = False,
    fold_threshold: int = MAX_PARTS_PER_STAGE,
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

    # one part cache per drain: micro-batch K+1 re-reads every part
    # micro-batch K read, plus K's own O(batch) delta — without the cache a
    # drain of K micro-batches scans the base state O(K) times (measured
    # ~13.7s fixed cost per micro-batch at sf0.1, BENCH/NOTES.md round 5).
    # Only held when this call also awaits the drain; a fire-and-forget
    # caller has no release point, so it runs uncached.
    part_cache = PartCache() if await_termination else None

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        process_batch(
            spark,
            batch_df,
            int(batch_id),
            stream_dir,
            config,
            fold_threshold,
            part_cache=part_cache,
        )

    q = (
        src.writeStream.foreachBatch(fn)
        .option("checkpointLocation", f"{stream_dir}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        try:
            q.awaitTermination()
            if auto_compact:
                compact_reopen(
                    spark,
                    input_dir,
                    stream_dir,
                    config,
                    scope="dirty",
                    part_cache=part_cache,
                )
        finally:
            part_cache.release()
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


def _multiplicity_turns(spark: SparkSession, input_dir: str) -> DataFrame:
    """Re-read the input directory with delivery duplicates collapsed.

    The stream is at-least-once: a redelivered file leaves byte-identical
    rows in the input dir. Those are delivery duplicates and must collapse
    — but only ACROSS files: byte-identical duplicate rows WITHIN one file
    are the W2 duplicate-turn ambiguity (a micro-batch sees them as two
    rows and quarantines the conversation), so compaction must reproduce
    each row at its maximum per-file multiplicity, not at 1 (ADVICE r3: a
    blanket dropDuplicates() silently re-clustered such conversations,
    breaking one-shot equivalence).

    SCALE CONTRACT (VERDICT r4 #1): the two multiplicity aggregations here
    group on the FULL input, and `compact_reopen(scope="dirty")`'s O(dirty)
    claim holds only because Catalyst's PushDownLeftSemiAntiJoin pushes the
    downstream conv_id semi-join (see `_scope_to`) below BOTH aggregates —
    the grouping keys contain conv_id, so the rewrite is legal and the
    exchange carries only the scoped conversations' rows. That property is
    pinned by tests/test_compact_scale.py (plan shape + flat shuffle-record
    counts under a 4x input history); keep conv_id in every grouping set
    here or the dirty scope silently regresses to an O(input-history)
    shuffle per compaction.
    """
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
    return turns.filter(
        F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull()
    )


def _scope_to(turns: DataFrame, conv_ids: DataFrame) -> DataFrame:
    """Restrict the multiplicity-collapsed turn view to a (small) conv_id
    set via a broadcast semi-join — written so the optimizer pushes it
    below `_multiplicity_turns`' aggregates (see that docstring)."""
    return turns.join(F.broadcast(conv_ids), "conv_id", "left_semi")


def compact_reopen(
    spark: SparkSession,
    input_dir: str,
    stream_dir: str,
    config: DedupConfig,
    scope: str = "full",
    part_cache: PartCache | None = None,
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
    prior = _prior_state(spark, manifest, cache=part_cache)

    nullsafe = _multiplicity_turns(spark, input_dir)
    # the hash probe reads only the candidate scope; the re-ingest below
    # must stay unrestricted (a touched cluster member need not be dirty)
    probe = nullsafe
    prior_h = prior.docs.select("conv_id", F.xxhash64("doc_text").alias("_h_old"))
    if scope == "dirty":
        dirty_ids = _read_parts(
            spark, dirty_parts, cache=part_cache, stage="dirty"
        ).distinct()
        probe = _scope_to(nullsafe, dirty_ids)
        # the hash diff then compares dirty-sized sets on both sides — the
        # promoted docs are scanned with a broadcast probe, not shuffled
        prior_h = prior_h.join(F.broadcast(dirty_ids), "conv_id", "left_semi")
    fresh = reassemble(probe).select(
        "conv_id", F.xxhash64("doc_text").alias("_h_new")
    )
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

    # exact-group members always share a cluster, so re-opening whole
    # touched clusters re-opens whole exact groups — dropping index rows
    # whose representative is re-opened never strands a live member
    view = PriorState(
        docs=prior.docs.join(reopen, "conv_id", "left_anti"),
        features=prior.features.join(reopen, "conv_id", "left_anti"),
        groups=prior.groups.join(reopen, "conv_id", "left_anti"),
        clusters=prior.clusters.join(reopen, "conv_id", "left_anti"),
        cand_index=prior.cand_index.join(reopen, "conv_id", "left_anti"),
        exact_index=prior.exact_index.join(
            reopen.withColumnRenamed("conv_id", "exact_rep"),
            "exact_rep",
            "left_anti",
        ),
    )
    out = merge_with_prior(
        spark,
        _scope_to(nullsafe, reopen),
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
    # exact-index tombstones: a content hash whose representative was
    # re-opened and that the re-ingest did NOT re-assert (the text vanished
    # from the corpus — its only holders changed) must not keep matching
    # future arrivals to a representative that no longer carries that text.
    # The merge's own exact_index_delta lands at the same seq, so the two
    # part sets are made disjoint here instead of relying on tie order.
    etombs = out["state"].materialize(
        "compact_exact_index_tombstones",
        lambda: prior.exact_index.join(
            reopen.withColumnRenamed("conv_id", "exact_rep"), "exact_rep", "left_semi"
        )
        .join(out["exact_index_delta"], ["h64", "h256"], "left_anti")
        .select(
            "h64", "h256", F.lit(None).cast("string").alias("exact_rep")
        ),
    )
    del etombs
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
            "cand_index": "incr_cand_index_delta",
            "exact_index": "incr_exact_index_delta",
        },
        extra_cluster_parts=[out["state"].stage_path("compact_tombstones")],
    )
    manifest["parts"]["exact_index"].append(
        [out["state"].stage_path("compact_exact_index_tombstones"), manifest["seq"]]
    )
    manifest["parts"]["dirty"] = []  # triggers consumed by this compaction
    fold_parts(spark, stream_dir, MAX_PARTS_PER_STAGE, manifest)
    _set_current(stream_dir, manifest)
    return n_reopen
