from __future__ import annotations

import os
import subprocess
import sys
import tempfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REF_BIN = REPO / "build" / "gdelta_ref"
REF_SRC = Path("/root/reference")


def _ensure_ref_binary() -> Path | None:
    """Build the reference C++ codec as an oracle subprocess (once)."""
    if REF_BIN.exists():
        return REF_BIN
    if not (REF_SRC / "gdelta.cpp").exists():
        return None
    REF_BIN.parent.mkdir(exist_ok=True)
    try:
        subprocess.run(
            [
                "g++", "-O2", "-o", str(REF_BIN),
                str(REF_SRC / "main.cpp"), str(REF_SRC / "gdelta.cpp"),
                "-I", str(REF_SRC),
            ],
            check=True, capture_output=True,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return REF_BIN


@pytest.fixture(scope="session")
def ref_gdelta():
    """(encode, decode) callables backed by the reference binary, or skip."""
    binary = _ensure_ref_binary()
    if binary is None:
        pytest.skip("reference gdelta binary unavailable")

    def encode(target: bytes, base: bytes) -> bytes:
        with tempfile.TemporaryDirectory() as d:
            bp, tp, dp = f"{d}/b", f"{d}/t", f"{d}/d"
            Path(bp).write_bytes(base)
            Path(tp).write_bytes(target)
            subprocess.run([str(binary), "-e", "-o", dp, bp, tp], check=True)
            return Path(dp).read_bytes()

    def decode(delta: bytes, base: bytes) -> bytes:
        with tempfile.TemporaryDirectory() as d:
            bp, dp, op = f"{d}/b", f"{d}/d", f"{d}/o"
            Path(bp).write_bytes(base)
            Path(dp).write_bytes(delta)
            subprocess.run([str(binary), "-d", "-o", op, bp, dp], check=True)
            return Path(op).read_bytes()

    return encode, decode


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("gdelta-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()
