"""Decode + verify jobs: encoded blocks -> tokens; equality check vs source.

Decode is one ``applyInPandas`` per part_id group: the 'base' bootstrap block
(block_id -1) is decoded first, then every data block against it. Verify
joins decoded rows to the original table and asserts token-array equality —
the reference's own round-trip test lifted to table scale
(/root/reference/test.sh:8-24)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from gdelta_spark import blocks
from gdelta_spark.codecs.delta import tokens_to_bytes

DECODED_SCHEMA = "doc_id string, tokens array<int>"


def _decode_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("block_id", ignore_index=True)
    base_rows = pdf[pdf["block_id"] < 0]
    if len(base_rows) != 1:
        raise ValueError(
            f"partition {pdf['part_id'].iloc[0]!r}: expected 1 base block, "
            f"got {len(base_rows)}"
        )
    base_arr = blocks.decode_block_rows(bytes(base_rows["blob"].iloc[0]))[0]
    base = tokens_to_bytes(base_arr)

    out_ids: list[str] = []
    out_tokens: list[np.ndarray] = []
    for _, row in pdf[pdf["block_id"] >= 0].iterrows():
        arrays = blocks.decode_block_rows(bytes(row["blob"]), base=base)
        ids = list(row["doc_ids"])
        if len(ids) != len(arrays):
            raise ValueError("doc_ids/rows mismatch in block")
        out_ids.extend(ids)
        out_tokens.extend(arrays)
    return pd.DataFrame({"doc_id": out_ids, "tokens": out_tokens})


def decode_tokens(blocks_df: DataFrame) -> DataFrame:
    return blocks_df.groupBy("part_id").applyInPandas(
        _decode_group, schema=DECODED_SCHEMA
    )


def verify_roundtrip(tokens_df: DataFrame, blocks_df: DataFrame) -> DataFrame:
    """Per-row equality report: (doc_id, ok). Join is a plain shuffle join on
    doc_id; `<=>` handles nulls. All-true == bit-identical corpus."""
    decoded = decode_tokens(blocks_df).withColumnRenamed("tokens", "decoded")
    return tokens_df.select("doc_id", "tokens").join(decoded, "doc_id", "full").select(
        "doc_id",
        F.expr("tokens <=> decoded").alias("ok"),
    )
