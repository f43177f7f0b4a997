"""Multimodal binary-column operators: plumbing real, decode stubbed."""

from __future__ import annotations

import numpy as np
import pytest

from gdelta_spark.ops import multimodal

SF = "/root/testdata/sf0.001"


def test_ingest_validates_and_fingerprints(spark):
    df = multimodal.documents_as_binary(spark, SF)
    out = multimodal.ingest_binary(df)
    rows = out.limit(5).collect()
    assert all(r["n_bytes"] == len(bytes(r["payload"])) for r in rows)
    assert len({r["fingerprint"] for r in rows}) == 5

    with pytest.raises(ValueError, match="missing columns"):
        multimodal.ingest_binary(df.drop("payload"))


def test_payload_features_match_bytes(spark):
    df = multimodal.documents_as_binary(spark, SF)
    feats = {r["item_id"]: r for r in multimodal.payload_features(df).collect()}
    for r in df.limit(10).collect():
        b = np.frombuffer(bytes(r["payload"]), np.uint8)
        f = feats[r["item_id"]]
        assert f["n_bytes"] == b.size
        assert f["n_space"] == int((b == 0x20).sum())
        assert f["n_digit"] == int(((b >= 0x30) & (b <= 0x39)).sum())


def test_sample_frames_deterministic(spark):
    df = multimodal.documents_as_binary(spark, SF)
    frames = multimodal.sample_frames(df, frame_bytes=16, n_frames=4)
    rows = frames.collect()
    assert rows, "no frames sampled"
    by_item: dict = {}
    for r in rows:
        by_item.setdefault(r["item_id"], []).append(r)
    payloads = {r["item_id"]: bytes(r["payload"]) for r in df.collect()}
    for item, frs in list(by_item.items())[:10]:
        raw = payloads[item]
        assert len(frs) <= 4
        for fr in frs:
            off = fr["frame_off"]
            assert bytes(fr["frame"]) == raw[off : off + 16]


def test_decode_media_is_stubbed():
    with pytest.raises(NotImplementedError, match="no media codec"):
        multimodal.decode_media(b"\x89PNG", "image/png")


def test_resize_payload_shapes(spark):
    """Nearest-neighbor resize: every non-empty payload resamples to exactly
    64 bytes; checksums match a per-row numpy reference; empty payloads
    produce no row."""
    import numpy as np

    from gdelta_spark.ops.multimodal import resize_payload

    rows = [
        (1, b"short"),
        (2, bytes(range(256)) * 4),
        (3, b""),
        (4, b"x" * 63),
        (5, b"y" * 65),
    ]
    df = spark.createDataFrame(rows, "item_id long, payload binary")
    got = {r["item_id"]: r for r in resize_payload(df).collect()}
    assert set(got) == {1, 2, 4, 5}  # empty payload dropped
    for item_id, payload in rows:
        if not payload:
            continue
        r = got[item_id]
        src = np.frombuffer(payload, np.uint8)
        idx = (np.arange(64, dtype=np.int64) * len(payload)) // 64
        want = src[idx]
        assert bytes(r["resized"]) == want.tobytes(), item_id
        assert r["n_src"] == len(payload)
        assert r["rsum"] == int(want.sum())
        assert r["rwsum"] == int((want.astype(np.int64) * np.arange(1, 65)).sum())


def test_bmp_spec_literal():
    """A 2x2 24-bit BMP hand-assembled from the format spec (not via our
    encoder): bottom-up rows, BGR, rows padded 6 -> 8 bytes. Pins the
    decoder to the SPEC, so a matched writer/parser bug pair can't cancel."""
    import struct

    # logical image (top-down RGB): [[red, green], [blue, white]]
    # file stores bottom row first: (blue, white) then (red, green), BGR
    row_bottom = bytes([255, 0, 0, 255, 255, 255]) + b"\x00\x00"  # blue, white
    row_top = bytes([0, 0, 255, 0, 255, 0]) + b"\x00\x00"  # red, green
    body = row_bottom + row_top
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(body), 0, 0, 0, 0)
    rgb = multimodal.decode_media(hdr + dib + body, "image/bmp")
    expect = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]], np.uint8
    )
    assert np.array_equal(rgb, expect)


def test_bmp_top_down_negative_height():
    rgb = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    blob = bytearray(multimodal.encode_bmp(rgb))
    import struct

    # rewrite as top-down: negate height, reverse stored row order
    (h,) = struct.unpack_from("<i", blob, 22)
    struct.pack_into("<i", blob, 22, -h)
    stride = (3 * 3 + 3) & ~3
    rows = [bytes(blob[54 + i * stride : 54 + (i + 1) * stride]) for i in range(h)]
    blob[54:] = b"".join(reversed(rows))
    assert np.array_equal(multimodal.decode_media(bytes(blob), "image/bmp"), rgb)


def test_wav_spec_literal_with_junk_chunk():
    """Hand-assembled RIFF with a LIST chunk between fmt and data: decoders
    that assume fixed offsets (data at byte 44) break here."""
    import struct

    samples = np.array([0, 1, -1, 32767, -32768], np.int16)
    data = samples.tobytes() + b"\x00"  # odd sample count -> pad byte
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
        + b"data" + struct.pack("<I", samples.nbytes) + data
    )
    blob = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    out, rate = multimodal.decode_media(blob, "audio/wav")
    assert rate == 16000
    assert np.array_equal(out, samples)


@pytest.mark.parametrize("w,h", [(1, 1), (2, 2), (3, 5), (4, 4), (6, 5), (7, 3)])
def test_bmp_roundtrip_shapes(w, h):
    rng = np.random.default_rng(w * 100 + h)
    rgb = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    assert np.array_equal(
        multimodal.decode_media(multimodal.encode_bmp(rgb), "image/bmp"), rgb
    )


def test_wav_roundtrip_and_rejects():
    rng = np.random.default_rng(9)
    s = rng.integers(-32768, 32768, 127).astype(np.int16)
    out, rate = multimodal.decode_media(
        multimodal.encode_wav(s, 44100, junk=b"odd"), "audio/wav"
    )
    assert rate == 44100 and np.array_equal(out, s)
    with pytest.raises(ValueError):
        multimodal.decode_media(b"nonsense-bytes", "audio/wav")
    with pytest.raises(ValueError):
        multimodal.decode_media(b"nonsense-bytes", "image/bmp")
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"\xff\xd8\xff", "image/jpeg")
