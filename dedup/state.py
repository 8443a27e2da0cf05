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
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from .config import DedupConfig

_PART_COL = "_part_id"


class RunState:
    def __init__(self, spark: SparkSession, base_dir: str, run_id: str, config: DedupConfig):
        self.spark = spark
        self.base_dir = base_dir.rstrip("/")
        self.run_id = run_id
        self.config = config
        self.run_dir = f"{self.base_dir}/{run_id}"
        os.makedirs(self.run_dir, exist_ok=True)
        self._metrics: list[dict] = []

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

    # --- stage execution ---
    def materialize(self, stage: str, build: Callable[[], DataFrame]) -> DataFrame:
        """Run (or resume) one stage; returns the materialized DataFrame."""
        path = self.stage_path(stage)
        if self.is_done(stage):
            self._metrics.append(
                {
                    "run_id": self.run_id,
                    "stage": stage,
                    "rows_out": int(self.read_manifest(stage)["rows"]),
                    "wall_ms": 0,
                    "resumed": True,
                    "config_fp": self.config.fingerprint,
                }
            )
            return self.spark.read.parquet(path).drop(_PART_COL)

        t0 = time.monotonic()
        df = build().withColumn(_PART_COL, F.spark_partition_id())
        df.write.mode("overwrite").parquet(path)
        wall_ms = int((time.monotonic() - t0) * 1000)

        written = self.spark.read.parquet(path)
        # per-partition lineage from the written table (single computation of
        # the stage; the count scan touches one int column)
        lineage = written.groupBy(F.col(_PART_COL).alias("partition_id")).agg(
            F.count("*").alias("rows_out")
        ).select(
            F.lit(self.run_id).alias("run_id"),
            F.lit(stage).alias("stage"),
            "partition_id",
            "rows_out",
            F.lit(wall_ms).alias("wall_ms"),
            F.lit(self.config.fingerprint).alias("config_fp"),
        )
        lineage.write.mode("append").parquet(f"{self.run_dir}/_lineage")
        rows = written.count()
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

    def flush_metrics(self) -> None:
        if not self._metrics:
            return
        df = self.spark.createDataFrame(
            [
                (
                    m["run_id"],
                    m["stage"],
                    m["rows_out"],
                    m["wall_ms"],
                    m["resumed"],
                    m["config_fp"],
                )
                for m in self._metrics
            ],
            "run_id string, stage string, rows_out long, wall_ms long, "
            "resumed boolean, config_fp string",
        )
        df.write.mode("append").parquet(f"{self.run_dir}/_metrics")
        self._metrics = []

    def metrics_df(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.run_dir}/_metrics")

    def lineage_df(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.run_dir}/_lineage")
