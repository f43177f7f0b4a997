"""Per-query decomposition probe: build wall vs collect wall vs job count.

Usage: python tools/query_probe.py neardup_pairs ann_ivf ...
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    import __spark_entry__ as entry_mod
    from gdelta_spark.pipeline.session import get_spark

    spark = get_spark("gdelta-query-probe", master=f"local[{CPUS}]")
    qs = entry_mod.queries()
    try:
        qs["roundtrip_auto"](spark, "/root/testdata/sf0.001").collect()
    except Exception as exc:  # noqa: BLE001
        print(f"warmup failed: {exc}", file=sys.stderr)

    st = spark.sparkContext.statusTracker()
    for name in sys.argv[1:]:
        j0 = len(st.getJobIdsForGroup(None)) if False else None
        ids0 = spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None)
        n0 = len(list(ids0))
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        t1 = time.time()
        df.collect()
        t2 = time.time()
        ids1 = spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None)
        n1 = len(list(ids1))
        print(
            f"{name}: build={t1 - t0:.2f}s collect={t2 - t1:.2f}s "
            f"jobs={n1 - n0}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
