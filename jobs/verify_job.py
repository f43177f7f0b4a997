"""spark-submit entry point: decode a warehouse and verify bit-identity
against the source tokens table.

    spark-submit --py-files gdelta_spark.zip jobs/verify_job.py \
        --input /path/tokens_parquet --warehouse /path/wh
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

from gdelta_spark.pipeline.decode import verify_roundtrip  # noqa: E402
from gdelta_spark.pipeline.session import get_spark  # noqa: E402
from gdelta_spark.pipeline.warehouse import Warehouse  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = get_spark("gdelta-verify", master=args.master)
    from gdelta_spark.pipeline.decode import verify_roundtrip_bin
    from gdelta_spark.pipeline.pyscan import scan_tokens_binary

    blocks = Warehouse(args.warehouse).read_blocks(spark)
    report = verify_roundtrip_bin(scan_tokens_binary(spark, args.input), blocks)
    total = report.count()
    bad = report.filter(~F.col("ok")).count()
    print(json.dumps({"rows": total, "mismatches": bad, "ok": bad == 0}))
    spark.stop()
    sys.exit(0 if bad == 0 else 1)


if __name__ == "__main__":
    main()
