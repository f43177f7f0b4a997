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
