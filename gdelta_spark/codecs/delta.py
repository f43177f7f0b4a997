"""Token-level wrapper registering the gdelta byte-delta codec as a block
codec: tokens -> little-endian int32 bytes -> delta vs the partition base
chunk (itself a serialized token buffer)."""

from __future__ import annotations

import numpy as np

from gdelta_spark.codecs import core
from gdelta_spark.codecs.gdelta_codec import gdelta_decode, gdelta_encode


def tokens_to_bytes(values: np.ndarray) -> bytes:
    return np.ascontiguousarray(values, dtype="<i4").tobytes()


def bytes_to_tokens(buf: bytes) -> np.ndarray:
    return np.frombuffer(buf, dtype="<i4").copy()


def gdelta_block_encode(values: np.ndarray, base: bytes) -> bytes:
    if base is None:
        raise ValueError("gdelta block codec requires a base chunk")
    return gdelta_encode(tokens_to_bytes(values), base)


def gdelta_block_decode(payload: bytes, base: bytes) -> np.ndarray:
    if base is None:
        raise ValueError("gdelta block codec requires a base chunk")
    return bytes_to_tokens(gdelta_decode(payload, base))


core.register(core.GDELTA, gdelta_block_encode, gdelta_block_decode)


def gdelta_rows_payload(
    arrays: list[np.ndarray], base: bytes, rows_bytes: list[bytes] | None = None
) -> bytes:
    """Row-wise delta payload: each row is delta-encoded against the base
    chunk separately. Concatenating rows first would defeat the reference's
    prefix/suffix elision (gdelta.cpp:234-272): elided base regions are
    excluded from the hash table (gdelta.cpp:335-336), so rows after the
    first could never copy from them. Per-row deltas also make every row's
    compressed size directly comparable to the C++ reference on the same
    (base, row) pair.

    Layout: [n_rows:u32][FOR-packed delta lens][concat delta blobs]."""
    import struct

    from gdelta_spark.codecs.light import _pack_for

    if base is None:
        raise ValueError("gdelta block codec requires a base chunk")
    from gdelta_spark.codecs.gdelta_codec import precompute_base_index
    from gdelta_spark.codecs.gdelta_group import gdelta_encode_group

    if rows_bytes is None:
        rows_bytes = [tokens_to_bytes(a) for a in arrays]
    if len(rows_bytes) > 1:
        # lockstep batched group encoder: byte-identical blobs, amortizes
        # per-probe fixed numpy dispatch across all rows of the group
        blobs = gdelta_encode_group(rows_bytes, base, precompute_base_index(base))
    else:
        blobs = [gdelta_encode(rb, base) for rb in rows_bytes]
    lens = np.array([len(b) for b in blobs], dtype=np.int64)
    return struct.pack("<I", len(blobs)) + _pack_for(lens) + b"".join(blobs)


def gdelta_rows_decode(payload: bytes, base: bytes) -> list[np.ndarray]:
    import struct

    from gdelta_spark.codecs.gdelta_codec import gdelta_decode_batch
    from gdelta_spark.codecs.light import _unpack_for

    if base is None:
        raise ValueError("gdelta block codec requires a base chunk")
    (n_rows,) = struct.unpack_from("<I", payload, 0)
    lens, pos = _unpack_for(payload, 4)
    if n_rows >= 8:
        # one vectorized parse + assembly across the whole block: the row
        # deltas are contiguous in the payload, which is exactly the batch
        # decoder's input shape
        spans = []
        for ln in lens.tolist():
            spans.append((pos, ln))
            pos += ln
        return [bytes_to_tokens(b) for b in gdelta_decode_batch(payload, spans, base)]
    out = []
    for ln in lens.tolist():
        out.append(bytes_to_tokens(gdelta_decode(payload[pos : pos + ln], base)))
        pos += ln
    return out
