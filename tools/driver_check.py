"""Strict mirror of the driver's correctness gate.

The driver canonicalizes each result by sorting columns by name, sorting
rows on all columns, then hashing with ``pd.util.hash_pandas_object`` —
which hashes raw bit patterns, so an int64 123 and a float64 123.0 do NOT
match (the round-1 failure mode: DuckDB SUM -> HUGEINT -> float64).
This tool reproduces that exact comparison at sf0.01 so hash_match
failures are caught locally before the driver runs.

Usage: python tools/driver_check.py [query_name ...]
"""

from __future__ import annotations

import json
import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(pdf):
    import pandas as pd

    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    pdf = pdf.sort_values(list(pdf.columns), ignore_index=True)
    return pdf


def _hash(pdf) -> int:
    import pandas as pd

    return int(pd.util.hash_pandas_object(pdf, index=False).sum())


def main() -> None:
    import duckdb

    import __spark_entry__ as entry_mod
    from gdelta_spark.pipeline.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("driver-check", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    report = {}
    for name in sorted(queries):
        if only and name not in only:
            continue
        row = {"rows_match": None, "schema_match": None, "hash_match": None, "err": None}
        try:
            spark_pdf = _canon(queries[name](spark, SF_DIR).toPandas())
            if name not in oracles:
                row["spark_rows"] = len(spark_pdf)
                row["err"] = "no_oracle"
                report[name] = row
                continue
            duck_pdf = _canon(con.execute(oracles[name]).fetchdf())
            row["rows_match"] = len(spark_pdf) == len(duck_pdf)
            row["schema_match"] = list(spark_pdf.columns) == list(duck_pdf.columns)
            row["hash_match"] = _hash(spark_pdf) == _hash(duck_pdf)
            row["spark_rows"] = len(spark_pdf)
            row["oracle_rows"] = len(duck_pdf)
            if not row["hash_match"]:
                row["spark_dtypes"] = {c: str(t) for c, t in spark_pdf.dtypes.items()}
                row["oracle_dtypes"] = {c: str(t) for c, t in duck_pdf.dtypes.items()}
        except Exception:
            row["err"] = traceback.format_exc(limit=3)
        report[name] = row
    spark.stop()
    print(json.dumps(report, indent=1))
    bad = [
        n for n, r in report.items()
        if r.get("err") not in (None, "no_oracle") or r.get("hash_match") is False
    ]
    print(f"BAD: {bad}" if bad else "ALL GREEN", file=sys.stderr)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
