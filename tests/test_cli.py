"""Subprocess e2e tests for the two spark-submit entry points
(BASELINE.json:6 "runs via spark-submit --py-files ..."): argparse →
pipeline → one-line JSON summary, resume semantics, and parity with the
library path. These are the binding invocation surface and were previously
exercised only by the manual verify recipe (VERDICT r3 #4)."""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
from pathlib import Path

from pyspark.sql import functions as F

from dedup.config import DedupConfig
from dedup.fixtures import gen_transcripts

REPO = Path(__file__).resolve().parent.parent


def _run(script: str, *args: str) -> tuple[int, dict | None, str]:
    """Run a jobs/ CLI; return (exit code, parsed last-stdout-JSON, stderr)."""
    proc = subprocess.run(
        [sys.executable, str(REPO / "jobs" / script), *args],
        capture_output=True,
        text=True,
        timeout=600,
    )
    payload = None
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            payload = json.loads(line)
            break
    return proc.returncode, payload, proc.stderr


def _write_corpus(spark, path: str, n: int = 50, seed: int = 71):
    df = gen_transcripts(spark, n, seed=seed, partitions=2, edge_rows=False)
    df.repartition(2, "conv_id").write.mode("overwrite").parquet(path)
    return df


def test_run_dedup_cli_fresh_resume_and_refusal(spark):
    corpus_dir = tempfile.mkdtemp(prefix="cli_corpus_")
    run_dir = tempfile.mkdtemp(prefix="cli_run_")
    _write_corpus(spark, corpus_dir)

    code, out, err = _run(
        "run_dedup.py",
        "--input", corpus_dir,
        "--run-dir", run_dir,
        "--run-id", "e2e",
        "--shuffle-partitions", "8",
        "--tiers",
    )
    assert code == 0, err[-2000:]
    assert out is not None and out["run_id"] == "e2e"
    assert out["n_convs"] == 50 and out["n_clusters"] >= 1
    # --tiers: per-tier rollup in the summary + a tiers parquet on disk
    assert sum(out["tiers"].values()) == out["n_convs"]
    assert set(out["tiers"]) <= {"exact", "near", "substring", "unique"}
    tiers_df = spark.read.parquet(f"{run_dir}/e2e/tiers")
    assert tiers_df.count() == out["n_convs"]

    # parity with the library path under the identical config
    from dedup.pipeline import run_pipeline

    ref = run_pipeline(
        spark,
        spark.read.parquet(corpus_dir),
        DedupConfig(shuffle_partitions=8),
        tempfile.mkdtemp(prefix="cli_ref_"),
        "ref",
        mode="persist",
    )["clusters"]
    assert out["n_clusters"] == ref.select("cluster_id").distinct().count()

    # rerun without --resume: refusal, exit 2
    code2, _, err2 = _run(
        "run_dedup.py",
        "--input", corpus_dir,
        "--run-dir", run_dir,
        "--run-id", "e2e",
        "--shuffle-partitions", "8",
    )
    assert code2 == 2 and "already complete" in err2

    # --resume: identical summary, and fast (stages skipped, not recomputed)
    code3, out3, err3 = _run(
        "run_dedup.py",
        "--input", corpus_dir,
        "--run-dir", run_dir,
        "--run-id", "e2e",
        "--resume",
        "--shuffle-partitions", "8",
    )
    assert code3 == 0, err3[-2000:]
    assert {k: out3[k] for k in ("n_convs", "n_clusters", "max_cluster")} == {
        k: out[k] for k in ("n_convs", "n_clusters", "max_cluster")
    }


def test_run_stream_cli_drains_and_auto_compact(spark):
    in_dir = tempfile.mkdtemp(prefix="cli_sin_")
    stream_dir = tempfile.mkdtemp(prefix="cli_sstate_")
    full = gen_transcripts(spark, 60, seed=73, partitions=2, edge_rows=False).localCheckpoint()
    straddle = F.crc32(F.col("conv_id")) % 5 == 0
    full.filter(~straddle | (F.col("turn_idx") < 2)).repartition(
        2, "conv_id"
    ).write.mode("append").parquet(in_dir)

    code, out, err = _run(
        "run_stream.py",
        "--input", in_dir,
        "--stream-dir", stream_dir,
        "--shuffle-partitions", "8",
        "--auto-compact",
    )
    assert code == 0, err[-2000:]
    assert out["n_convs"] == 60 and out["dirty_parts_pending"] == 0

    # drain 2: straddling tails arrive; auto-compact restores batch parity
    full.filter(straddle & (F.col("turn_idx") >= 2)).repartition(
        1, "conv_id"
    ).write.mode("append").parquet(in_dir)
    code2, out2, err2 = _run(
        "run_stream.py",
        "--input", in_dir,
        "--stream-dir", stream_dir,
        "--shuffle-partitions", "8",
        "--auto-compact",
        "--gc",
    )
    assert code2 == 0, err2[-2000:]
    assert out2["last_batch_id"] >= 1 and out2["n_convs"] == 60
    # --gc ran against the quiescent post-compaction state and reported a
    # byte count; the n_convs/n_clusters asserts below read the manifest
    # AFTER the gc, so a gc that deleted referenced parts would fail them
    assert isinstance(out2["gc_bytes_freed"], int)
    assert out2["gc_bytes_freed"] >= 0

    from dedup.pipeline import run_pipeline

    ref = run_pipeline(
        spark,
        spark.read.parquet(in_dir),
        DedupConfig(shuffle_partitions=8),
        tempfile.mkdtemp(prefix="cli_sref_"),
        "ref",
        mode="persist",
    )["clusters"]
    assert out2["n_clusters"] == ref.select("cluster_id").distinct().count()

    # config-bound refusal: different shingle config against the same state
    code3, _, err3 = _run(
        "run_stream.py",
        "--input", in_dir,
        "--stream-dir", stream_dir,
        "--shuffle-partitions", "8",
        "--k-shingle", "4",
    )
    assert code3 == 2 and "config-bound" in err3
