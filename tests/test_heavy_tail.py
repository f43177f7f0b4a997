"""Heavy-tail skew: a 1M-token row (4 MB serialized) alongside small rows —
the case the n_tok-bucket salting exists for (FIXTURES.md skew requirement)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from gdelta_spark.pipeline import decode as decode_mod
from gdelta_spark.pipeline import encode as encode_mod
from gdelta_spark.pipeline import generator, partitioning


def test_million_token_row_roundtrip(spark):
    rng = np.random.default_rng(9)
    recs = [("big-00000001", rng.integers(0, 50000, 1_000_000, dtype=np.int32).tolist(), 1_000_000, "mixed")]
    for i in range(50):
        recs.append(
            (f"small-{i:08d}", rng.integers(0, 50000, 256, dtype=np.int32).tolist(), 256, "mixed")
        )
    df = spark.createDataFrame(
        pd.DataFrame(recs, columns=["doc_id", "tokens", "n_tok", "source"]),
        schema=generator.TOKENS_SCHEMA,
    )

    # the big row must land in its own bucket (log2 separates 256 vs 1M)
    salted = partitioning.with_salt(df, group_bytes=1 << 20)
    parts = {r["doc_id"]: r["part_id"] for r in salted.select("doc_id", "part_id").collect()}
    big_part = parts["big-00000001"]
    assert all(p != big_part for d, p in parts.items() if d != "big-00000001")

    blocks_df = encode_mod.encode_blocks(df, group_bytes=1 << 20)
    report = decode_mod.verify_roundtrip(df, blocks_df)
    assert report.filter(~F.col("ok")).count() == 0
    assert report.count() == 51
