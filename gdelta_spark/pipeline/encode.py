"""Encode job: tokens DataFrame -> encoded-blocks DataFrame.

The kernel is one ``applyInPandas`` per (source, bucket, salt) group — rows
arrive as an Arrow batch, all work is numpy (SURVEY §3.2). Per group:

1. sort rows by doc_id (determinism: base election and block boundaries are
   order-independent),
2. elect the base chunk = tokens of the min-doc_id row (serialized int32 LE),
3. slice rows into blocks of ~BLOCK_TOKENS tokens,
4. per block: cost-based codec choice + encode (raw-fallback guarded),
5. emit one row per block plus one 'base' bootstrap block (block_id -1,
   raw-encoded elected row) so decode needs no side channel.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from gdelta_spark import blocks
from gdelta_spark.codecs import core
from gdelta_spark.codecs.delta import tokens_to_bytes
from gdelta_spark.pipeline import partitioning

BLOCK_TOKENS = 1 << 19  # ~2 MiB serialized per block

BLOCKS_SCHEMA = (
    "part_id string, block_id int, codec string, base_doc_id string, "
    "doc_ids array<string>, n_rows int, n_tokens long, "
    "raw_bytes long, enc_bytes long, blob binary"
)


def _encode_group(pdf: pd.DataFrame, force_codec: int | None = None) -> pd.DataFrame:
    pdf = pdf.sort_values("doc_id", kind="mergesort", ignore_index=True)
    part_id = pdf["part_id"].iloc[0]
    # rows arrive pre-serialized (binary cells — see serde.py); token arrays
    # are zero-copy views over them
    rows_bytes = [bytes(c) for c in pdf["tok_bytes"]]
    arrays = [np.frombuffer(c, dtype="<i4") for c in rows_bytes]
    doc_ids = pdf["doc_id"].tolist()

    base_doc_id = doc_ids[0]
    base = rows_bytes[0]

    out = []
    # bootstrap block: the base row itself, raw (decode reads it first)
    base_blob, _ = blocks.encode_block_rows([arrays[0]], codec_id=core.RAW)
    out.append(
        (part_id, -1, "base", base_doc_id, [base_doc_id], 1,
         int(arrays[0].size), int(arrays[0].nbytes), len(base_blob), base_blob)
    )

    # codec choice once per group (groups are partition-homogeneous by
    # construction); the per-block raw-fallback guard still protects
    # against local expansion
    group_codec = force_codec
    if group_codec is None:
        from gdelta_spark import chooser

        sample = np.concatenate(arrays[:64])[: chooser.SAMPLE_TOKENS * 4]
        # probe rows exclude arrays[0]: it IS the base (self-delta ~ 0 bytes
        # would wildly overestimate gdelta's win)
        probe_rows = arrays[1:4] if len(arrays) > 1 else arrays[:1]
        group_codec, _ = chooser.choose_codec(sample, probe_rows, base)

    block_id = 0
    i = 0
    n = len(arrays)
    while i < n:
        j = i
        tok = 0
        while j < n and (tok == 0 or tok + arrays[j].size <= BLOCK_TOKENS):
            tok += arrays[j].size
            j += 1
        chunk = arrays[i:j]
        blob, cid = blocks.encode_block_rows(
            chunk, codec_id=group_codec, base=base, rows_bytes=rows_bytes[i:j]
        )
        raw_bytes = int(sum(a.nbytes for a in chunk))
        out.append(
            (part_id, block_id, core.CODEC_NAMES[cid], base_doc_id,
             doc_ids[i:j], j - i, int(tok), raw_bytes, len(blob), blob)
        )
        block_id += 1
        i = j

    return pd.DataFrame(
        out,
        columns=[
            "part_id", "block_id", "codec", "base_doc_id", "doc_ids",
            "n_rows", "n_tokens", "raw_bytes", "enc_bytes", "blob",
        ],
    )


def encode_blocks_bin(
    bin_df: DataFrame,
    group_bytes: int | None = None,
    force_codec: int | None = None,
    stats_df: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, n_tok, source, tok_bytes) -> encoded blocks DataFrame.

    ``stats_df``: optional cheap (n_tok, source) source for the salt plan so
    the heavy binary scan runs exactly once (see partitioning.with_salt)."""
    salted = partitioning.with_salt(
        bin_df, group_bytes or partitioning.DEFAULT_GROUP_BYTES, stats_df=stats_df
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return _encode_group(pdf, force_codec=force_codec)

    return (
        salted.select("part_id", "doc_id", "tok_bytes")
        .groupBy("part_id")
        .applyInPandas(kernel, schema=BLOCKS_SCHEMA)
    )


def encode_blocks(
    tokens_df: DataFrame,
    group_bytes: int | None = None,
    force_codec: int | None = None,
) -> DataFrame:
    """tokens (doc_id, tokens, n_tok, source) -> encoded blocks DataFrame.

    For parquet-backed inputs prefer pyscan.scan_tokens_binary +
    encode_blocks_bin (skips the slow JVM array->Arrow conversion)."""
    from gdelta_spark.pipeline import serde

    bin_df = serde.serialize_tokens(tokens_df, keep=("doc_id", "n_tok", "source"))
    return encode_blocks_bin(bin_df, group_bytes=group_bytes, force_codec=force_codec)


def encode_blocks_forced(
    tokens_df: DataFrame, codec_id: int, group_bytes: int | None = None
) -> DataFrame:
    """Encode with a single forced codec (raw-fallback guard still applies)."""
    return encode_blocks(tokens_df, group_bytes=group_bytes, force_codec=codec_id)


def partition_summary(blocks_df: DataFrame) -> DataFrame:
    """Per-partition byte metrics (manifest fields)."""
    data = blocks_df.filter(F.col("block_id") >= 0)
    return data.groupBy("part_id").agg(
        F.first("base_doc_id").alias("base_doc_id"),
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("raw_bytes").alias("raw_bytes"),
        F.sum("enc_bytes").alias("enc_bytes"),
        F.array_distinct(F.collect_list("codec")).alias("codecs"),
    )
