"""End-to-end spark-submit --py-files deployment test (north rule: the
pipeline "runs via spark-submit --py-files on a multi-executor cluster").

The job scripts are copied OUT of the repo into a temp dir and run with cwd
there, so the only way executors (and the driver) can import gdelta_spark is
from the zip shipped via --py-files — this genuinely exercises the deploy
shape, not the checkout's sys.path fallback.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit")


def _submit(tmp: Path, zip_path: Path, script: str, *args: str) -> str:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # nothing up the sleeve: zip or bust
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", str(zip_path),
            str(tmp / script), *args,
        ],
        capture_output=True, text=True, timeout=600, cwd=tmp, env=env,
    )
    assert out.returncode == 0, f"{script} failed:\n{out.stdout}\n{out.stderr}"
    return out.stdout


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_encode_verify_via_spark_submit(spark, tmp_path):
    from gdelta_spark.pipeline.generator import write_tokens_table

    src = str(tmp_path / "tokens")
    write_tokens_table(spark, src, rows_per_regime=30, num_partitions=2)

    zip_path = tmp_path / "gdelta_spark.zip"
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "make_pyfiles_zip.py"), str(zip_path)],
        check=True, capture_output=True,
    )
    # the job scripts add their own parent.parent to sys.path; copying them
    # into the temp dir points that at the temp dir, not the repo
    for script in ("encode_job.py", "verify_job.py"):
        shutil.copy(REPO / "jobs" / script, tmp_path / script)

    wh = str(tmp_path / "wh")
    enc_out = _submit(
        tmp_path, zip_path, "encode_job.py",
        "--input", src, "--warehouse", wh, "--group-mb", "4",
        "--master", "local[2]",
    )
    summary = json.loads(
        [l for l in enc_out.strip().splitlines() if l.startswith("{")][-1]
    )
    assert summary["encoded"] > 0

    ver_out = _submit(
        tmp_path, zip_path, "verify_job.py",
        "--input", src, "--warehouse", wh, "--group-mb", "4",
        "--master", "local[2]",
    )
    report = json.loads(
        [l for l in ver_out.strip().splitlines() if l.startswith("{")][-1]
    )
    assert report["ok"] is True and report["mismatches"] == 0


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_encode_via_local_cluster_executors(spark, tmp_path):
    """Same deploy shape across SEPARATE executor JVMs (local-cluster):
    the closest in-sandbox stand-in for a real multi-executor cluster —
    executors import the package only from the --py-files zip and run the
    full scan -> shuffle -> encode -> commit pipeline."""
    from gdelta_spark.pipeline.generator import write_tokens_table

    src = str(tmp_path / "tokens")
    write_tokens_table(spark, src, rows_per_regime=30, num_partitions=2)

    zip_path = tmp_path / "gdelta_spark.zip"
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "make_pyfiles_zip.py"), str(zip_path)],
        check=True, capture_output=True,
    )
    shutil.copy(REPO / "jobs" / "encode_job.py", tmp_path / "encode_job.py")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    wh = str(tmp_path / "wh")
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local-cluster[2,1,1024]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", str(zip_path),
            str(tmp_path / "encode_job.py"),
            "--input", src, "--warehouse", wh, "--group-mb", "4",
            "--master", "local-cluster[2,1,1024]",
        ],
        capture_output=True, text=True, timeout=600, cwd=tmp_path, env=env,
    )
    assert out.returncode == 0, f"local-cluster encode failed:\n{out.stderr[-3000:]}"
    summary = json.loads(
        [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    )
    assert summary["encoded"] > 0 and summary["rows"] > 0
