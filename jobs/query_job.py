"""Run any registered engine query from the command line / spark-submit.

Every operator in the engine's surface (``__spark_entry__.queries()``) is
runnable standalone — the "a user of the reference could switch and run
every query" story as an actual CLI, deployable exactly like the encode
job (``spark-submit --py-files build/gdelta_spark.zip jobs/query_job.py``).

    python jobs/query_job.py --list
    python jobs/query_job.py --query ann_topk --sf-dir /root/testdata/sf0.01
    python jobs/query_job.py --query dedup_keep --show 5 --out /tmp/kept.parquet
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", help="name from queries() (see --list)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--master", default=None, help="default local[8]")
    ap.add_argument("--show", type=int, default=20, help="rows to print (0 = none)")
    ap.add_argument("--out", default=None, help="optional parquet output path")
    ap.add_argument("--list", action="store_true", help="list query names and exit")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    if args.list or not args.query:
        oracles = set(entry_mod.oracle_sql())
        for name in sorted(qs):
            tag = "hash-checked" if name in oracles else "rows-only"
            print(f"{name:28s} [{tag}]")
        return
    if args.query not in qs:
        sys.exit(f"unknown query {args.query!r}; --list shows the registry")

    from gdelta_spark.pipeline.session import get_spark

    spark = get_spark(
        f"gdelta-query-{args.query}",
        master=args.master or "local[8]",
        shuffle_partitions=32,
    )
    t0 = time.time()
    df = qs[args.query](spark, args.sf_dir)
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
    else:
        n = df.count()
    wall = time.time() - t0
    if args.show:
        df.show(args.show, truncate=False)
    print(f"query={args.query} rows={n} wall={wall:.2f}s sf_dir={args.sf_dir}")
    spark.stop()


if __name__ == "__main__":
    main()
