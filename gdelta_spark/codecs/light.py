"""Lightweight columnar codecs: bit-packing, frame-of-reference, dictionary,
run-length. Pure numpy, fully vectorized; these are the per-column encodings
the north rule adds around the reference's delta codec (the reference itself
has none — /root/reference contains only the byte-delta kernel).

All payload layouts are this engine's own little-endian formats.
"""

from __future__ import annotations

import struct

import numpy as np

from gdelta_spark.codecs import core

# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def bit_width(max_val: int) -> int:
    """Bits needed for values in [0, max_val]."""
    return int(max_val).bit_length() if max_val > 0 else 0


def bitpack(vals: np.ndarray, width: int) -> bytes:
    """Pack non-negative values at ``width`` bits each, little-endian bit
    order. Word-lane method: the (word, bit-offset) pattern repeats every 64
    values, so packing is 64 vectorized shift/or lanes over n/64-length
    columns (~2 element-ops per value) — no bit matrix."""
    n = vals.size
    if width == 0 or n == 0:
        return b""
    v = vals.astype(np.uint64, copy=False)
    m = (n + 63) // 64
    if m * 64 != n:
        v = np.concatenate([v, np.zeros(m * 64 - n, dtype=np.uint64)])
    V = v.reshape(m, 64)
    out = np.zeros((m, width), dtype=np.uint64)
    for c in range(64):
        bitpos = c * width
        w_i, off = bitpos >> 6, bitpos & 63
        col = V[:, c]
        out[:, w_i] |= col << np.uint64(off)
        rem = off + width - 64
        if rem > 0:
            out[:, w_i + 1] |= col >> np.uint64(width - rem)
    return out.tobytes()[: (n * width + 7) // 8]


def bitunpack(buf: bytes, n: int, width: int) -> np.ndarray:
    """Inverse of bitpack -> uint64 array of length n."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    m = (n + 63) // 64
    need = m * width * 8
    if len(buf) < need:
        buf = bytes(buf) + b"\x00" * (need - len(buf))
    W = np.frombuffer(buf, dtype="<u8", count=m * width).reshape(m, width)
    out = np.empty((m, 64), dtype=np.uint64)
    mask = np.uint64((1 << width) - 1) if width < 64 else np.uint64(2**64 - 1)
    for c in range(64):
        bitpos = c * width
        w_i, off = bitpos >> 6, bitpos & 63
        x = W[:, w_i] >> np.uint64(off)
        rem = off + width - 64
        if rem > 0:
            x = x | (W[:, w_i + 1] << np.uint64(width - rem))
        out[:, c] = x & mask
    return out.reshape(-1)[:n]


def _pack_for(vals: np.ndarray) -> bytes:
    """Frame-of-reference sub-block: [n:u32][min:i64][width:u8][packed]."""
    n = vals.size
    if n == 0:
        return struct.pack("<IqB", 0, 0, 0)
    v = vals.astype(np.int64, copy=False)
    lo = int(v.min())
    rel = (v - lo).astype(np.uint64)
    width = bit_width(int(rel.max()))
    return struct.pack("<IqB", n, lo, width) + bitpack(rel, width)


def _unpack_for(buf: bytes, pos: int) -> tuple[np.ndarray, int]:
    n, lo, width = struct.unpack_from("<IqB", buf, pos)
    pos += 13
    nbytes = (n * width + 7) // 8
    rel = bitunpack(buf[pos : pos + nbytes], n, width)
    pos += nbytes
    return rel.view(np.int64) + lo, pos


# ---------------------------------------------------------------------------
# codecs
# ---------------------------------------------------------------------------


def raw_encode(values: np.ndarray) -> bytes:
    return struct.pack("<I", values.size) + values.astype("<i4", copy=False).tobytes()


def raw_decode(buf: bytes) -> np.ndarray:
    (n,) = struct.unpack_from("<I", buf, 0)
    return np.frombuffer(buf, dtype="<i4", count=n, offset=4).copy()


def for_encode(values: np.ndarray) -> bytes:
    """Frame-of-reference + bit-pack: v - min(v) at bit_length(max-min) bits."""
    return _pack_for(values)


def for_decode(buf: bytes) -> np.ndarray:
    out, _ = _unpack_for(buf, 0)
    return out.astype(np.int32)


def dict_encode(values: np.ndarray) -> bytes:
    """Dictionary: sorted unique values (FOR-packed) + per-row codes
    (bit-packed at bit_length(n_unique-1))."""
    uniq, codes = np.unique(values, return_inverse=True)
    width = bit_width(uniq.size - 1)
    head = struct.pack("<I", values.size)
    dict_blk = _pack_for(uniq)
    return head + dict_blk + bitpack(codes.astype(np.uint64), width)


def dict_decode(buf: bytes) -> np.ndarray:
    (n,) = struct.unpack_from("<I", buf, 0)
    uniq, pos = _unpack_for(buf, 4)
    width = bit_width(uniq.size - 1)
    codes = bitunpack(buf[pos:], n, width).view(np.int64)
    return uniq[codes].astype(np.int32)


def rle_encode(values: np.ndarray) -> bytes:
    """Run-length: run values (FOR-packed) + run lengths (FOR-packed)."""
    n = values.size
    if n == 0:
        return struct.pack("<I", 0) + _pack_for(values) + _pack_for(values)
    v = values.astype(np.int64, copy=False)
    bounds = np.flatnonzero(np.diff(v) != 0) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [n]))
    run_vals = v[starts]
    run_lens = ends - starts
    return struct.pack("<I", n) + _pack_for(run_vals) + _pack_for(run_lens)


def rle_decode(buf: bytes) -> np.ndarray:
    (n,) = struct.unpack_from("<I", buf, 0)
    run_vals, pos = _unpack_for(buf, 4)
    run_lens, _ = _unpack_for(buf, pos)
    return np.repeat(run_vals, run_lens).astype(np.int32)


core.register(core.RAW, raw_encode, raw_decode)
core.register(core.FOR, for_encode, for_decode)
core.register(core.DICT, dict_encode, dict_decode)
core.register(core.RLE, rle_encode, rle_decode)
