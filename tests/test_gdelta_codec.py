"""Oracle-anchored tests for the gdelta delta codec.

Mirrors the reference's own round-trip strategy (/root/reference/test.sh:8-24)
and extends it: cross-decodability in both directions, size <= reference
(the north-rule bar), and byte-exact blob parity on every regime we generate.
"""

from __future__ import annotations

import numpy as np
import pytest

from gdelta_spark.codecs.gdelta_codec import (
    gdelta_decode,
    gdelta_encode,
    parse_units,
    read_varint,
    write_varint,
)

rng = np.random.default_rng(42)


def _rand_bytes(n: int) -> bytes:
    return bytes(rng.integers(0, 256, n, dtype=np.uint8))


def _mutate(base: bytes, n_edits: int) -> bytes:
    b = bytearray(base)
    for _ in range(n_edits):
        op = int(rng.integers(0, 3))
        pos = int(rng.integers(0, max(1, len(b))))
        if op == 0 and b:
            b[pos] = int(rng.integers(0, 256))
        elif op == 1:
            b[pos:pos] = _rand_bytes(int(rng.integers(1, 40)))
        else:
            del b[pos : pos + int(rng.integers(1, 40))]
    return bytes(b)


def _cases() -> list[tuple[str, bytes, bytes]]:
    cpp = open("/root/reference/gdelta.cpp", "rb").read()
    hdr = open("/root/reference/gdelta.h", "rb").read()
    blob = _rand_bytes(5000)
    cases = [
        ("ref-pair-fwd", cpp, hdr),
        ("ref-pair-rev", hdr, cpp),
        ("identical", blob, blob),
        ("empty-target", blob, b""),
        ("empty-base", b"", blob),
        ("both-empty", b"", b""),
        ("target-in-base", blob, blob[100:3000]),
        ("base-in-target", blob[100:3000], blob),
        ("tiny", b"abcd", b"abxd"),
        ("below-strlook", bytes(range(15)), bytes(range(14))),
        ("prefix-17", blob[:17] + b"X" * 100, blob[:17] + b"Y" * 100),
        ("prefix-16", blob[:16] + b"X" * 100, blob[:16] + b"Y" * 100),
        ("suffix-17", b"X" * 100 + blob[:17], b"Y" * 100 + blob[:17]),
        ("suffix-16", b"X" * 100 + blob[:16], b"Y" * 100 + blob[:16]),
        (
            "texty",
            b"the quick brown fox " * 500,
            b"the quick brown fox " * 300 + b"jumped " + b"the quick brown fox " * 200,
        ),
        ("runs", b"\x00" * 4000 + b"\x01" * 4000, b"\x00" * 3500 + b"\x01" * 4500),
        ("random-vs-random", _rand_bytes(20000), _rand_bytes(20000)),
    ]
    for i in range(10):
        base = _rand_bytes(int(rng.integers(100, 150000)))
        cases.append((f"near-dup-{i}", base, _mutate(base, int(rng.integers(1, 30)))))
    return cases


CASES = _cases()


@pytest.mark.parametrize("name,base,target", CASES, ids=[c[0] for c in CASES])
def test_self_roundtrip(name, base, target):
    delta = gdelta_encode(target, base)
    assert gdelta_decode(delta, base) == target


@pytest.mark.parametrize("name,base,target", CASES, ids=[c[0] for c in CASES])
def test_oracle_parity(name, base, target, ref_gdelta):
    ref_encode, ref_decode = ref_gdelta
    ours = gdelta_encode(target, base)
    refd = ref_encode(target, base)
    # we decode reference blobs bit-identically
    assert gdelta_decode(refd, base) == target
    # reference decodes our blobs bit-identically (CLI can't write 0 bytes)
    if target:
        assert ref_decode(ours, base) == target
    # north-rule bar: compressed size <= reference; we currently hit exact parity
    assert len(ours) <= len(refd), f"{name}: ours {len(ours)} > ref {len(refd)}"
    assert ours == refd, f"{name}: blob mismatch (size ours={len(ours)} ref={len(refd)})"


def test_varint_roundtrip():
    for val in [0, 1, 63, 64, 127, 128, 255, 1 << 20, (1 << 35) + 12345]:
        buf = bytearray()
        write_varint(buf, val)
        got, pos = read_varint(bytes(buf), 0)
        assert got == val and pos == len(buf)


def test_parse_units_phantoms():
    # short-length units carry an always-written 0x00 varint that re-parses
    # as a zero-length INSERT phantom; decode must treat it as a no-op.
    base = b"A" * 100
    target = b"A" * 100 + b"B"
    delta = gdelta_encode(target, base)
    units, _ = parse_units(delta)
    assert gdelta_decode(delta, base) == target


def test_int32_token_buffers():
    # the engine's actual payload: little-endian int32 token buffers
    base_tokens = rng.integers(0, 50000, 8000, dtype=np.int32)
    new_tokens = base_tokens.copy()
    new_tokens[1234:1240] = 7
    base = base_tokens.tobytes()
    target = new_tokens.tobytes()
    delta = gdelta_encode(target, base)
    assert gdelta_decode(delta, base) == target
    assert len(delta) < len(target) // 50  # near-dup must compress hard


def test_batch_decode_equals_per_row():
    """gdelta_decode_batch over contiguous deltas == per-row gdelta_decode,
    across regimes (dense/sparse streams, phantom units, irregular rows)."""
    from gdelta_spark.codecs.gdelta_codec import gdelta_decode_batch

    for base_kind in ("texty", "near-dup", "random"):
        if base_kind == "texty":
            base = b"the quick brown fox " * 800
            rows = [
                _mutate(b"the quick brown fox " * int(rng.integers(400, 900)), 5)
                for _ in range(40)
            ]
        elif base_kind == "near-dup":
            base = _rand_bytes(30000)
            rows = [_mutate(base, int(rng.integers(1, 12))) for _ in range(40)]
        else:
            base = _rand_bytes(5000)
            rows = [_rand_bytes(int(rng.integers(0, 9000))) for _ in range(40)]
        deltas = [gdelta_encode(r, base) for r in rows]
        payload = b"".join(deltas)
        spans = []
        pos = 0
        for d in deltas:
            spans.append((pos, len(d)))
            pos += len(d)
        got = gdelta_decode_batch(payload, spans, base)
        assert len(got) == len(rows)
        for g, r, d in zip(got, rows, deltas):
            assert g == gdelta_decode(d, base) == r, base_kind


def test_batch_decode_empty_and_single():
    from gdelta_spark.codecs.gdelta_codec import gdelta_decode_batch

    assert gdelta_decode_batch(b"", [], b"abc") == []
    base = _rand_bytes(2000)
    tgt = _mutate(base, 3)
    d = gdelta_encode(tgt, base)
    assert gdelta_decode_batch(d, [(0, len(d))], base) == [tgt]


def test_base_index_encode_identical():
    """BaseIndex fast path (cached tables, fancy-assign scatter, zero-compute
    strided builds) must not change a single emitted byte vs the plain path."""
    from gdelta_spark.codecs.gdelta_codec import BaseIndex, precompute_base_fps

    for name, base, target in CASES:
        if not base:
            continue
        bi = BaseIndex(base)
        plain = gdelta_encode(target, base)
        with_fps = gdelta_encode(target, base, precompute_base_fps(base))
        with_index = gdelta_encode(target, base, bi)
        again = gdelta_encode(target, base, bi)  # cached-table path
        assert plain == with_fps == with_index == again, name


def test_base_index_table_matches_plain_build():
    """The strided-view fancy-assign scatter must reproduce the reference's
    last-writer-wins table exactly (C-order fancy assignment == overwrite)."""
    from gdelta_spark.codecs.gdelta_codec import BaseIndex, _build_hash_table

    base = _rand_bytes(5000)
    base8 = np.frombuffer(base, np.uint8)
    bi = BaseIndex(base)
    for beg, end in [(0, 0), (0, 100), (17, 0), (17, 33), (1, 1), (101, 202)]:
        bit = ((len(base) - beg - end) + 10).bit_length()
        plain = _build_hash_table(base8, beg, end, bit, None)
        fast = _build_hash_table(base8, beg, end, bit, bi)
        assert np.array_equal(plain, fast), (beg, end)
