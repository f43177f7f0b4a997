"""Mirror of the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB over the same sf0.01 parquet, compare
row count, column names, and order-insensitive values."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            try:
                df[c] = pd.to_numeric(df[c]).astype("float64")
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def _compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> None:
    assert list(sorted(spark_pdf.columns)) == list(sorted(duck_pdf.columns)), (
        f"{name}: column mismatch {spark_pdf.columns} vs {duck_pdf.columns}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in a.columns:
        if a[c].dtype == float:
            ok = [
                (math.isnan(x) and math.isnan(y)) or abs(x - y) <= 1e-9 * max(1, abs(x), abs(y))
                for x, y in zip(a[c], b[c])
            ]
            assert all(ok), f"{name}: value mismatch in {c}"
        else:
            assert (a[c] == b[c]).all(), f"{name}: value mismatch in {c}"


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_all_queries_have_coverage():
    assert set(ORACLES) <= set(QUERIES)
    # every claimed operator has a query; non-SQL ops are known + bounded
    rows_only = set(QUERIES) - set(ORACLES)
    assert rows_only == {"compression_summary", "fixture_regimes"}


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck):
    spark_pdf = QUERIES[name](spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(ORACLES[name]).fetchdf()
    _compare(name, spark_pdf, duck_pdf)


@pytest.mark.parametrize("name", ["compression_summary", "fixture_regimes", "streaming_ingest"])
def test_rows_only_queries_run(name, spark):
    pdf = QUERIES[name](spark, SF_DIR).toPandas()
    assert len(pdf) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    pdf = df.toPandas()
    assert len(pdf) > 0
