"""spark-submit --py-files packaging check (SURVEY.md M7): the `dedup`
package must be importable from a zip on sys.path, exactly as Spark
distributes --py-files archives to executors."""

from __future__ import annotations

import subprocess
import sys
import zipfile
from pathlib import Path

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
