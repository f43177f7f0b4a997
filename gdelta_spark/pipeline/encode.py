"""Encode job: tokens DataFrame -> encoded-blocks DataFrame.

The kernel is one ``applyInPandas`` per (source, bucket, salt) group — rows
arrive as an Arrow batch, all work is numpy (SURVEY §3.2). Per group:

1. sort rows by doc_id (determinism: base election and block boundaries are
   order-independent),
2. cluster rows by content MinHash (token-aligned 8-byte windows) so each
   delta base is elected per *cluster of similar rows*, not per group — on
   heterogeneous partitions a single base only deltas its own look-alikes
   (round-1 verdict #7); clusters below MIN_CLUSTER_ROWS merge into a rest
   cluster,
3. per cluster: cost-based codec choice, then slice into ~BLOCK_TOKENS
   blocks and encode (raw-fallback guarded),
4. emit one row per block plus one 'base' bootstrap block (block_id < 0,
   raw-encoded elected row) per gdelta-coded cluster so decode needs no
   side channel; data blocks name their base via base_doc_id.
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


_SIG_MULT_1 = np.uint64(0x9E3779B97F4A7C15)
_SIG_MULT_2 = np.uint64(0xC2B2AE3D27D4EB4F)
MIN_CLUSTER_ROWS = 3


def _row_signature(rb: bytes) -> tuple[int, int]:
    """Two MinHashes over token-aligned 8-byte windows (4-byte stride) of
    the serialized row. Whole-token insertions/deletions shift content by
    multiples of 4 bytes, so window alignment survives edits; near-duplicate
    rows therefore share both minima with high probability. O(n_tok),
    vectorized; a false merge only costs ratio (correctness never depends on
    base choice — SURVEY §0)."""
    a = np.frombuffer(rb, dtype="<u4")
    if a.size < 2:
        v = int(a[0]) if a.size else 0
        return (v, v)
    w = a[:-1].astype(np.uint64) | (a[1:].astype(np.uint64) << np.uint64(32))
    return (int((w * _SIG_MULT_1).min()), int((w * _SIG_MULT_2).min()))


def _cluster_rows(rows_bytes: list[bytes]) -> list[list[int]]:
    """Row indices grouped by shared signature, in first-occurrence order of
    the doc_id-sorted input (deterministic). Clusters smaller than
    MIN_CLUSTER_ROWS merge into one trailing rest cluster — heterogeneous,
    so the chooser rarely picks gdelta there."""
    groups: dict[tuple[int, int], list[int]] = {}
    for i, rb in enumerate(rows_bytes):
        groups.setdefault(_row_signature(rb), []).append(i)
    clusters: list[list[int]] = []
    rest: list[int] = []
    for idx in groups.values():
        if len(idx) >= MIN_CLUSTER_ROWS:
            clusters.append(idx)
        else:
            rest.extend(idx)
    clusters.sort(key=lambda ix: ix[0])
    if rest:
        clusters.append(sorted(rest))
    return clusters


def _encode_group(pdf: pd.DataFrame, force_codec: int | None = None) -> pd.DataFrame:
    pdf = pdf.sort_values("doc_id", kind="mergesort", ignore_index=True)
    part_id = pdf["part_id"].iloc[0]
    # rows arrive pre-serialized (binary cells — see serde.py); token arrays
    # are zero-copy views over them
    rows_bytes = [bytes(c) for c in pdf["tok_bytes"]]
    arrays = [np.frombuffer(c, dtype="<i4") for c in rows_bytes]
    doc_ids = pdf["doc_id"].tolist()

    out = []
    block_id = 0
    n_base = 0
    for idx in _cluster_rows(rows_bytes):
        base_i = idx[0]
        base = rows_bytes[base_i]
        base_doc_id = doc_ids[base_i]

        # codec choice once per cluster; the per-block raw-fallback guard
        # still protects against local expansion
        cluster_codec = force_codec
        if cluster_codec is None:
            from gdelta_spark import chooser

            cl_arrays = [arrays[k] for k in idx[:64]]
            sample = np.concatenate(cl_arrays)[: chooser.SAMPLE_TOKENS * 4]
            # probe rows exclude the base row (self-delta ~ 0 bytes would
            # wildly overestimate gdelta's win)
            probe_rows = (
                [arrays[k] for k in idx[1:4]] if len(idx) > 1 else [arrays[base_i]]
            )
            cluster_codec, _ = chooser.choose_codec(sample, probe_rows, base)

        if cluster_codec == core.GDELTA:
            # bootstrap block: the elected base row, self-contained (any
            # codec except gdelta — no base available at decode time; the
            # chooser with base=None never picks gdelta); only gdelta-coded
            # clusters need one
            n_base += 1
            base_blob, _ = blocks.encode_block_rows([arrays[base_i]], base=None)
            out.append(
                (part_id, -n_base, "base", base_doc_id, [base_doc_id], 1,
                 int(arrays[base_i].size), int(arrays[base_i].nbytes),
                 len(base_blob), base_blob)
            )

        i = 0
        n = len(idx)
        while i < n:
            j = i
            tok = 0
            while j < n and (tok == 0 or tok + arrays[idx[j]].size <= BLOCK_TOKENS):
                tok += arrays[idx[j]].size
                j += 1
            sel = idx[i:j]
            chunk = [arrays[k] for k in sel]
            blob, cid = blocks.encode_block_rows(
                chunk, codec_id=cluster_codec, base=base,
                rows_bytes=[rows_bytes[k] for k in sel],
            )
            raw_bytes = int(sum(a.nbytes for a in chunk))
            out.append(
                (part_id, block_id, core.CODEC_NAMES[cid], base_doc_id,
                 [doc_ids[k] for k in sel], j - i, int(tok), raw_bytes, len(blob), blob)
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
