"""End-to-end spark-submit --py-files deployment test (north-rule shape):
package the library as a zip, submit scripts/build_job.py against local[4],
and check the index it builds answers a query."""

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit_bin() -> str | None:
    p = shutil.which("spark-submit")
    if p:
        return p
    try:
        import pyspark

        cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
        return cand if os.path.exists(cand) else None
    except ImportError:
        return None


def test_spark_submit_pyfiles_build(tmp_path):
    submit = _spark_submit_bin()
    if submit is None:
        pytest.skip("spark-submit not available")
    zpath = str(tmp_path / "iresearch_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "iresearch_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    idx = str(tmp_path / "idx")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
    proc = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            os.path.join(REPO, "scripts", "build_job.py"),
            "--synthetic", "300",
            "--index-dir", idx,
            "--num-segments", "4",
            "--query", "import,return",
            "--k", "5",
        ],
        capture_output=True,
        text=True,
        timeout=570,
        env=env,
        cwd=str(tmp_path),  # not the repo: imports must come from the zip
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["docs"] == 300
    assert out["segments"] == 4
    assert len(out["topk"]) == 5
    assert out["topk"][0]["score"] > 0
