"""spark-submit --py-files packaging check (SURVEY.md M7): the `dedup`
package must be importable from a zip on sys.path, exactly as Spark
distributes --py-files archives to executors."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def test_dedup_zip_importable(tmp_path):
    zpath = tmp_path / "dedup.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for py in sorted((REPO / "dedup").glob("*.py")):
            z.write(py, f"dedup/{py.name}")

    code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import dedup.pipeline, dedup.queries, dedup.fixtures, dedup.embedding; "
        "from dedup.config import DedupConfig; "
        "print(DedupConfig().fingerprint)"
    )
    out = subprocess.run(
        [sys.executable, "-c", code, str(zpath)],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # not the repo: proves the zip alone suffices
    )
    assert out.returncode == 0, out.stderr
    assert len(out.stdout.strip()) == 16


def test_spark_submit_py_files_e2e(spark, tmp_path):
    """The binding invocation (BASELINE.json:6): an ACTUAL `spark-submit
    --py-files dedup.zip jobs/run_dedup.py` run, from a cwd where the repo
    is NOT importable and with PYTHONPATH stripped, so every `dedup.*`
    import on driver and Python workers must resolve from the shipped zip
    — the distribution contract a multi-executor cluster relies on."""
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not Path(spark_submit).exists():
        pytest.skip("spark-submit not on this host")

    zpath = tmp_path / "dedup.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for py in sorted((REPO / "dedup").glob("*.py")):
            z.write(py, f"dedup/{py.name}")
    script = tmp_path / "run_dedup.py"  # copied out of the repo tree
    shutil.copy(REPO / "jobs" / "run_dedup.py", script)

    corpus = tmp_path / "corpus"
    from dedup.fixtures import gen_transcripts

    gen_transcripts(spark, 50, seed=71, partitions=2, edge_rows=False).repartition(
        2, "conv_id"
    ).write.parquet(str(corpus))

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_MASTER_SET"] = "1"  # let --master below win (session.py contract)
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[2]",
            "--driver-memory", "4g",
            "--py-files", str(zpath),
            str(script),
            "--input", str(corpus),
            "--run-dir", str(tmp_path / "run"),
            "--run-id", "pyfiles",
            "--shuffle-partitions", "4",
            "--fast",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(tmp_path),
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    payload = None
    for line in reversed(proc.stdout.strip().splitlines()):
        if line.strip().startswith("{"):
            payload = json.loads(line)
            break
    assert payload is not None, proc.stdout[-2000:]
    assert payload["run_id"] == "pyfiles"
    assert payload["n_convs"] == 50 and payload["n_clusters"] >= 1
