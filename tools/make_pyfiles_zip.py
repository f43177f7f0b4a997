"""Build the --py-files artifact: zip the gdelta_spark package for
spark-submit distribution to executors.

    python tools/make_pyfiles_zip.py [out_zip]    # default build/gdelta_spark.zip

The zip contains the package at its importable root (gdelta_spark/...), so

    spark-submit --py-files build/gdelta_spark.zip jobs/encode_job.py ...

works from any cwd with no repo checkout on the executors — the deploy shape
the north rule's multi-executor criterion assumes. Entries are written in
sorted order with a fixed timestamp so the artifact is byte-reproducible.
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build(out: Path) -> Path:
    pkg = REPO / "gdelta_spark"
    files = sorted(
        p for p in pkg.rglob("*.py") if "__pycache__" not in p.parts
    )
    out.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in files:
            info = zipfile.ZipInfo(str(p.relative_to(REPO)), date_time=(2020, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            z.writestr(info, p.read_bytes())
    return out


if __name__ == "__main__":
    dest = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "build" / "gdelta_spark.zip"
    print(build(dest))
