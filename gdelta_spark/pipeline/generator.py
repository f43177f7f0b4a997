"""Distributed deterministic generation of the tokens table.

Row content is a pure function of the global row id (seed-derived), so the
table is identical regardless of partitioning/parallelism — the property the
resume and scaling tests rely on. Generation runs in ``mapInPandas`` (Arrow
batches, no per-row Python at the Spark boundary; the per-row numpy work is
the generator itself)."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from gdelta_spark import fixtures

TOKENS_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def tokens_table(
    spark: SparkSession,
    rows_per_regime: int,
    seed: int = 42,
    regimes: tuple[str, ...] = fixtures.REGIMES,
    num_partitions: int | None = None,
) -> DataFrame:
    n_regimes = len(regimes)
    total = rows_per_regime * n_regimes

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for gid in pdf["id"].tolist():
                regime = regimes[gid % n_regimes]
                i = gid // n_regimes
                tokens = fixtures.make_tokens(seed, regime, i)
                recs.append(
                    (f"{regime}-{i:08d}", tokens, tokens.size, regime)
                )
            yield pd.DataFrame(
                recs, columns=["doc_id", "tokens", "n_tok", "source"]
            )

    rng = spark.range(total, numPartitions=num_partitions)
    return rng.mapInPandas(gen, schema=TOKENS_SCHEMA)


def write_tokens_table(
    spark: SparkSession, path: str, rows_per_regime: int, seed: int = 42, **kw
) -> None:
    tokens_table(spark, rows_per_regime, seed, **kw).write.mode("overwrite").parquet(path)
