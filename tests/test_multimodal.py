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
