"""Run state: per-stage materialization, checkpoint/resume, lineage +
metrics tables (SURVEY.md §2.1 S4, §3.3; BASELINE.json:6,14 "resumable from
Iceberg snapshot/checkpoint state with per-partition lineage and metrics").

Every pipeline stage is materialized to the run directory (Iceberg tables on
a cluster via io.write_table, parquet here). Materialization is what makes
the pipeline resumable *and* truncates lineage between stages (no
ever-growing plan trees). A stage is skipped on resume iff its manifest
records the same config fingerprint and status=done — the recall target is
config-bound (BASELINE.json:14), so resuming across configs is refused.

Lineage: stage outputs carry the writing task's partition id; per-partition
row counts are derived from the written table and appended to the lineage
table. Metrics: one row per stage execution (rows out, wall ms, resumed).

Modes: ``parquet`` (default) materializes every stage to storage — the
resume/lineage feature, and on a real cluster the natural checkpoint
cadence. ``persist`` is the bench/CI fast path: stages are eagerly
``localCheckpoint``-ed — lineage truncated into block-store RDD blocks, no
parquet encode/decode/commit barrier and no InMemoryRelation cache-lookup
overhead (plain ``persist``+count measured ~2x SLOWER than parquet here;
localCheckpoint measured ~2x faster). Resume is unsupported in persist mode
(local checkpoints die with the session — on a cluster they also don't
survive executor loss, which is exactly why parquet stays the default);
metrics still flow, lineage (which reads written files) does not.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from .config import DedupConfig

_PART_COL = "_part_id"


def push_job_desc(spark: SparkSession, desc: str | None) -> str | None:
    """Set the (thread-local) Spark job description (guide §1.5), returning
    the previous value so the caller can restore it in a finally block —
    nested scopes (a micro-batch label around stage labels) compose.
    Failures are swallowed: labeling is purely diagnostic."""
    try:
        sc = spark.sparkContext
        old = sc.getLocalProperty("spark.job.description")
        sc.setJobDescription(desc)
        return old
    except Exception:
        return None


def nullable_clone(schema):
    """The given schema with every field (recursively) nullable — exactly
    what parquet schema inference would return for data written from it.
    Used to re-read a just-written stage with 0 footer-inference jobs while
    keeping the DataFrame schema byte-identical to an inferred read."""
    import json as _json

    from pyspark.sql.types import StructType

    def fix(node):
        if isinstance(node, dict):
            for k in ("nullable", "containsNull", "valueContainsNull"):
                if k in node:
                    node[k] = True
            for v in node.values():
                fix(v)
        elif isinstance(node, list):
            for v in node:
                fix(v)

    d = _json.loads(schema.json())
    fix(d)
    return StructType.fromJson(d)


class RunState:
    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        run_id: str,
        config: DedupConfig,
        mode: str = "parquet",
    ):
        if mode not in ("parquet", "persist"):
            raise ValueError(f"unknown RunState mode {mode!r}")
        self.spark = spark
        self.base_dir = base_dir.rstrip("/")
        self.run_id = run_id
        self.config = config
        self.mode = mode
        self.run_dir = f"{self.base_dir}/{run_id}"
        os.makedirs(self.run_dir, exist_ok=True)
        self._metrics: list[dict] = []
        self._rows: dict[str, int] = {}  # stage -> rows_out, survives flush
        self._checkpointed: list[DataFrame] = []
        self._checkpoint_rdd_ids: list[int] = []

    # --- manifests ---
    def _manifest_path(self, stage: str) -> str:
        return f"{self.run_dir}/{stage}.manifest.json"

    def stage_path(self, stage: str) -> str:
        return f"{self.run_dir}/{stage}"

    def read_manifest(self, stage: str) -> dict | None:
        p = self._manifest_path(stage)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _write_manifest(self, stage: str, payload: dict) -> None:
        p = self._manifest_path(stage)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f, sort_keys=True)
        os.replace(tmp, p)  # atomic: a torn write can never look 'done'

    def is_done(self, stage: str) -> bool:
        m = self.read_manifest(stage)
        return (
            m is not None
            and m.get("status") == "done"
            and m.get("config_fp") == self.config.fingerprint
        )

    def _set_job_desc(self, desc: str | None) -> str | None:
        """Label this stage's jobs in the UI/event log (guide §1.5); job
        descriptions are thread-local, so concurrent stage materializations
        from the pool label independently. Returns the previous description
        so callers can restore it (an enclosing scope — e.g. a micro-batch
        — may have set its own label)."""
        return push_job_desc(self.spark, desc)

    # --- stage execution ---
    def materialize(self, stage: str, build: Callable[[], DataFrame]) -> DataFrame:
        """Run (or resume) one stage; returns the materialized DataFrame."""
        if self.mode == "persist":
            return self._persist_stage(stage, build)
        path = self.stage_path(stage)
        if self.is_done(stage):
            self._rows[stage] = int(self.read_manifest(stage)["rows"])
            self._metrics.append(
                {
                    "run_id": self.run_id,
                    "stage": stage,
                    "rows_out": self._rows[stage],
                    "wall_ms": 0,
                    "resumed": True,
                    "config_fp": self.config.fingerprint,
                }
            )
            return self.spark.read.parquet(path).drop(_PART_COL)

        t0 = time.monotonic()
        prev = self._set_job_desc(f"stage:{stage}")
        try:
            df = build().withColumn(_PART_COL, F.spark_partition_id())
            df.write.mode("overwrite").parquet(path)
        finally:
            self._set_job_desc(prev)
        wall_ms = int((time.monotonic() - t0) * 1000)

        # re-read with the written schema (all-nullable, exactly what
        # inference would return): a schema-less read.parquet costs one
        # footer-inference Spark job per stage — measured 0.27s vs 0.025s
        # and 1 job vs 0 — which at ~8 stages per micro-batch was a
        # visible slice of the drain's fixed cost (guide §1.2/§6)
        written = self.spark.read.schema(nullable_clone(df.schema)).parquet(path)
        # per-partition lineage: one parquet footer read per task-written
        # file — zero Spark jobs. Falls back to a Spark aggregation for
        # non-local storage. The stage row count is the sum — no count() job.
        per_part = self._partition_counts(path, written)
        rows = sum(r[1] for r in per_part)
        self._rows[stage] = rows
        self._append_lineage(stage, per_part, wall_ms)
        if os.environ.get("DEDUP_STAGE_DEBUG"):
            total_ms = int((time.monotonic() - t0) * 1000)
            print(f"[stage {stage}] build+write={wall_ms}ms total={total_ms}ms rows={rows}")
        self._metrics.append(
            {
                "run_id": self.run_id,
                "stage": stage,
                "rows_out": rows,
                "wall_ms": wall_ms,
                "resumed": False,
                "config_fp": self.config.fingerprint,
            }
        )
        self._write_manifest(
            stage,
            {
                "status": "done",
                "rows": rows,
                "wall_ms": wall_ms,
                "config_fp": self.config.fingerprint,
                "run_id": self.run_id,
            },
        )
        return written.drop(_PART_COL)

    def materialize_ephemeral(
        self, stage: str, build: Callable[[], DataFrame]
    ) -> DataFrame:
        """Materialize an INTERMEDIATE stage via eager localCheckpoint even
        when the run is in parquet mode.

        For stages whose output is consumed only within the same run and
        never promoted/read back (e.g. the incremental merge's candidate
        and verification intermediates), the parquet encode+commit+re-read
        barrier buys nothing: a crashed run recomputes them
        deterministically from the durable stages on redelivery. Skipping
        it removes one job barrier + one round trip through storage per
        stage — a measurable share of a micro-batch drain's fixed cost."""
        return self._persist_stage(stage, build)

    def materialize_lazy(self, stage: str, build: Callable[[], DataFrame]) -> DataFrame:
        """Lineage cut WITHOUT an action: lazy localCheckpoint.

        For run-internal intermediates that feed exactly one downstream
        materialization chain, even the eager-checkpoint action is pure
        fixed cost: the stage can compute inside the first consuming job
        and cache its blocks there (Spark's block-store getOrCompute makes
        a concurrent second consumer wait for, not recompute, the same
        blocks). Each lazy stage removes one checkpoint job + one count
        job + their driver planning gaps from a micro-batch's critical
        path — no metrics row is recorded (nothing ran yet)."""
        prev = self._set_job_desc(f"stage:{stage}:plan")
        try:
            # no action runs here, but plan→RDD conversion submits the
            # plan's broadcast-exchange futures, which capture the current
            # (thread-local) description — label them for the event log
            df = build().localCheckpoint(eager=False)
        finally:
            self._set_job_desc(prev)
        self._checkpointed.append(df)
        try:
            self._checkpoint_rdd_ids.append(
                df._jdf.queryExecution().analyzed().rdd().id()
            )
        except Exception:
            pass
        return df

    def _persist_stage(self, stage: str, build: Callable[[], DataFrame]) -> DataFrame:
        """Bench/CI fast path: eager localCheckpoint — lineage truncated
        into block-store RDD blocks, so a stage runs exactly once even when
        three candidate stages are materialized concurrently, with none of
        the parquet encode/decode/commit barrier. (Not persist()+count:
        InMemoryRelation's cache canonicalization + AQE interplay measured
        ~2x slower than even the parquet write+read-back.)"""
        t0 = time.monotonic()
        prev = self._set_job_desc(f"stage:{stage}")
        try:
            # LAZY checkpoint + count: the count job computes the plan,
            # caches every partition's blocks (getOrCompute) and finalizes
            # the checkpoint in ONE job — the eager form paid a separate
            # materialization job before the count (2 barriers per stage,
            # ~8 stages per timed pipeline rep)
            df = build().localCheckpoint(eager=False)
        finally:
            self._set_job_desc(prev)
        self._checkpointed.append(df)
        try:
            # the checkpointed DF's analyzed plan is a LogicalRDD holding the
            # persisted internal-row RDD — record its id so release() can
            # unpersist exactly this run's blocks (df.rdd would be a derived
            # deserialization RDD, not the persisted one)
            self._checkpoint_rdd_ids.append(
                df._jdf.queryExecution().analyzed().rdd().id()
            )
        except Exception:
            pass
        prev = self._set_job_desc(f"stage:{stage}:count")
        try:
            rows = df.count()
        finally:
            self._set_job_desc(prev)
        self._rows[stage] = rows
        wall_ms = int((time.monotonic() - t0) * 1000)
        if os.environ.get("DEDUP_STAGE_DEBUG"):
            print(f"[stage {stage}] persist={wall_ms}ms rows={rows}")
        self._metrics.append(
            {
                "run_id": self.run_id,
                "stage": stage,
                "rows_out": rows,
                "wall_ms": wall_ms,
                "resumed": False,
                "config_fp": self.config.fingerprint,
            }
        )
        return df

    def _partition_counts(self, path: str, written) -> list[tuple[int, int]]:
        """[(partition_id, rows)] per written file. Local parquet: footer
        metadata only (part files are 'part-<partid>-…'). Else: Spark agg."""
        import glob

        files = sorted(glob.glob(f"{path}/part-*.parquet"))
        if files:
            try:
                import pyarrow.parquet as pq

                out = []
                for f in files:
                    pid = int(os.path.basename(f).split("-")[1])
                    out.append((pid, pq.read_metadata(f).num_rows))
                return out
            except Exception:
                pass
        rows = (
            written.groupBy(F.col(_PART_COL).alias("partition_id"))
            .agg(F.count("*").alias("rows_out"))
            .collect()
        )
        return [(r["partition_id"], r["rows_out"]) for r in rows]

    def _append_lineage(self, stage: str, per_part: list[tuple[int, int]], wall_ms: int) -> None:
        """Lineage rows appended as one parquet file via pyarrow — no Spark
        job for a driver-sized table."""
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pa.table(
            {
                "run_id": [self.run_id] * len(per_part),
                "stage": [stage] * len(per_part),
                "partition_id": pa.array([p for p, _ in per_part], pa.int32()),
                "rows_out": pa.array([n for _, n in per_part], pa.int64()),
                "wall_ms": pa.array([wall_ms] * len(per_part), pa.int64()),
                "config_fp": [self.config.fingerprint] * len(per_part),
            }
        )
        d = f"{self.run_dir}/_lineage"
        os.makedirs(d, exist_ok=True)
        pq.write_table(tbl, f"{d}/lineage-{stage}-{uuid.uuid4().hex[:8]}.parquet")

    def flush_metrics(self) -> None:
        # free run-scoped caches (e.g. candidates.bucket_pairs' sized bucket
        # tables, verify's pair table); per-stage clearing would clobber
        # sibling stages running concurrently. In persist mode the stage
        # outputs ARE the cache — clearing would force full recomputation of
        # anything the caller consumes after the run.
        if self.mode != "persist":
            try:
                self.spark.catalog.clearCache()
            except Exception:
                pass
        if not self._metrics:
            return
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pa.table(
            {
                "run_id": [m["run_id"] for m in self._metrics],
                "stage": [m["stage"] for m in self._metrics],
                "rows_out": pa.array([m["rows_out"] for m in self._metrics], pa.int64()),
                "wall_ms": pa.array([m["wall_ms"] for m in self._metrics], pa.int64()),
                "resumed": [m["resumed"] for m in self._metrics],
                "config_fp": [m["config_fp"] for m in self._metrics],
            }
        )
        d = f"{self.run_dir}/_metrics"
        os.makedirs(d, exist_ok=True)
        pq.write_table(tbl, f"{d}/metrics-{uuid.uuid4().hex[:8]}.parquet")
        self._metrics = []

    def release(self) -> None:
        """Free persist-mode checkpoint blocks when the run's outputs are no
        longer needed (e.g. between bench pipelines). Scoped strictly to the
        DataFrames THIS run localCheckpoint-ed: local checkpoints truncate
        lineage, so unpersisting anything else in the context (another run's
        stages, cc.py round checkpoints, test fixtures in a shared session)
        would leave it unrecomputable. No-op in parquet mode."""
        if self.mode != "persist":
            return
        try:
            jmap = self.spark.sparkContext._jsc.getPersistentRDDs()
            for rdd_id in self._checkpoint_rdd_ids:
                jrdd = jmap.get(rdd_id)
                if jrdd is not None:
                    jrdd.unpersist(False)
        except Exception:
            pass
        self._checkpointed = []
        self._checkpoint_rdd_ids = []

    def rows_of(self, stage: str) -> int | None:
        """Row count of an already-materialized stage this run (None if the
        stage has not run, or ran only as a lazy lineage cut). Survives
        flush_metrics — promotion consults it after the merge flushed."""
        return self._rows.get(stage)

    def metrics_df(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.run_dir}/_metrics")

    def lineage_df(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.run_dir}/_lineage")
