"""Query-phase micro-bench for optimization work (bench.py is FROZEN).

Replicates bench.py's _run_queries methodology exactly — same session
factory, same warmup (roundtrip_auto at sf0.001), same per-query wall
clock around build+collect — but runs ONLY the query phase, optionally a
subset, optionally repeated, and can dump .explain("formatted") plans.

Usage:
    python bench_extra.py                       # all HEADLINE queries once
    python bench_extra.py -q neardup_pairs -q ann_ivf -r 3
    python bench_extra.py --plans plans/r06 --suffix _before
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "roundtrip_auto",
    "roundtrip_gdelta",
    "compression_summary",
    "tokenize_stats",
    "vocab_topk",
    "bucket_histogram",
    "event_runs",
    "dedup_exact",
    "ann_topk",
    "ann_lsh_best_pairs",
    "ann_ivf",
    "ann_ivf2",
    "ann_recall",
    "neardup_pairs",
    "neardup_components",
    "dedup_keep",
    "simhash_text",
    "embed_neardup_keep",
    "quality_ratios",
    "streaming_window_append",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-q", "--query", action="append", default=None,
                    help="query name (repeatable); default: all HEADLINE")
    ap.add_argument("-r", "--reps", type=int, default=1)
    ap.add_argument("--plans", default=None,
                    help="directory to write <query><suffix>.txt explain plans")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from gdelta_spark.pipeline.session import get_spark

    spark = get_spark("gdelta-bench-extra", master=f"local[{CPUS}]")
    qs = entry_mod.queries()
    names = args.query or HEADLINE

    if not args.no_warmup:
        t0 = time.time()
        try:
            qs["roundtrip_auto"](spark, "/root/testdata/sf0.001").collect()
        except Exception as exc:  # noqa: BLE001
            print(f"warmup failed (continuing cold): {exc}", file=sys.stderr)
        print(f"warmup {time.time() - t0:.1f}s", file=sys.stderr)

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name in names:
            try:
                df = qs[name](spark, SF_DIR)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            except Exception as exc:  # noqa: BLE001
                plan = f"explain failed: {exc}"
            out = Path(args.plans) / f"{name}{args.suffix}.txt"
            out.write_text(plan)
            print(f"wrote {out}", file=sys.stderr)

    samples: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(args.reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            try:
                qs[name](spark, SF_DIR).collect()
            except Exception as exc:  # noqa: BLE001
                print(f"query {name} FAILED: {exc}", file=sys.stderr)
                samples[name].append(-1.0)
                continue
            finally:
                spark.sparkContext.setJobDescription(None)
            samples[name].append(round(time.time() - t0, 3))
    best = {n: min(v) for n, v in samples.items() if v}
    print(json.dumps({
        "metric": "query_phase_only",
        "value": round(sum(t for t in best.values() if t > 0), 3),
        "unit": "sec",
        "queries": best,
        "samples": samples,
        "sf": SF_DIR.rstrip("/").split("/")[-1],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
