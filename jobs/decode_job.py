"""spark-submit entry point: decode a warehouse back into a tokens parquet
table (doc_id, tokens array<int>).

    spark-submit --py-files gdelta_spark.zip jobs/decode_job.py \
        --warehouse /path/wh --output /path/decoded_parquet
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gdelta_spark.pipeline.decode import decode_tokens  # noqa: E402
from gdelta_spark.pipeline.session import get_spark  # noqa: E402
from gdelta_spark.pipeline.warehouse import Warehouse  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = get_spark("gdelta-decode", master=args.master)
    blocks = Warehouse(args.warehouse).read_blocks(spark)
    decoded = decode_tokens(blocks)
    decoded.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(json.dumps({"rows": n, "output": args.output}))
    spark.stop()


if __name__ == "__main__":
    main()
