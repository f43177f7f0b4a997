"""Structured-Streaming incremental encode: two file waves -> one warehouse,
exactly-once across restarts, decoded corpus bit-identical."""

from __future__ import annotations

import pyspark.sql.functions as F

from gdelta_spark.pipeline import decode as decode_mod
from gdelta_spark.pipeline import generator, streaming, warehouse


def test_incremental_encode(spark, tmp_path):
    inbox = str(tmp_path / "inbox")
    wh_root = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")

    wave1 = generator.tokens_table(spark, rows_per_regime=12, seed=42, num_partitions=2)
    wave1.write.mode("append").parquet(inbox)

    q = streaming.incremental_encode(spark, inbox, wh_root, ckpt, group_bytes=4 << 20)
    q.awaitTermination(300)
    n_manifests_1 = len(warehouse.Warehouse(wh_root).committed_manifests())
    assert n_manifests_1 > 0

    # wave 2: new docs (disjoint ids via start offset)
    import pandas as pd

    from gdelta_spark import fixtures

    recs = []
    for regime in fixtures.REGIMES:
        for doc_id, tokens, n_tok, source in fixtures.rows(42, regime, 8, start=1000):
            recs.append((doc_id, tokens.tolist(), int(n_tok), source))
    wave2 = spark.createDataFrame(
        pd.DataFrame(recs, columns=["doc_id", "tokens", "n_tok", "source"]),
        schema=generator.TOKENS_SCHEMA,
    )
    wave2.write.mode("append").parquet(inbox)

    q = streaming.incremental_encode(spark, inbox, wh_root, ckpt, group_bytes=4 << 20)
    q.awaitTermination(300)
    n_manifests_2 = len(warehouse.Warehouse(wh_root).committed_manifests())
    assert n_manifests_2 > n_manifests_1

    # replay with the same checkpoint: no new batches, no new manifests
    q = streaming.incremental_encode(spark, inbox, wh_root, ckpt, group_bytes=4 << 20)
    q.awaitTermination(300)
    assert len(warehouse.Warehouse(wh_root).committed_manifests()) == n_manifests_2

    # decoded corpus == everything ever ingested
    all_tokens = spark.read.parquet(inbox)
    blocks_df = warehouse.Warehouse(wh_root).read_blocks(spark)
    report = decode_mod.verify_roundtrip(all_tokens, blocks_df)
    assert report.filter(~F.col("ok")).count() == 0
    assert report.count() == all_tokens.count()


def test_first_seen_dedup_state(spark, tmp_path):
    """Cross-batch duplicates are suppressed by state; within-batch survivor
    is the min-(wave, doc_id) row; new keys in later waves still emit."""
    import os
    import time as _time

    import pandas as pd

    from gdelta_spark.pipeline.streaming import first_seen_dedup

    inbox = str(tmp_path / "inbox")
    w0 = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "text": ["aa", "bb", "cc", "aa"], "wave": 0}
    )
    # 10-13 duplicate wave-0 texts (suppress); 14 is new (emit)
    w1 = pd.DataFrame(
        {"doc_id": [10, 11, 12, 14], "text": ["aa", "bb", "cc", "dd"], "wave": 1}
    )
    spark.createDataFrame(w0).coalesce(1).write.mode("append").parquet(inbox)
    spark.createDataFrame(w1).coalesce(1).write.mode("append").parquet(inbox)
    now = _time.time()
    for name in os.listdir(inbox):
        if name.endswith(".parquet"):
            p = os.path.join(inbox, name)
            import pyarrow.parquet as pq

            first = pq.read_table(p, columns=["wave"]).column("wave")[0].as_py()
            os.utime(p, (now - 60 + 30 * first,) * 2)

    stream = (
        spark.readStream.schema("doc_id long, text string, wave long")
        .option("maxFilesPerTrigger", 1)
        .parquet(inbox)
    )
    import pyspark.sql.functions as F

    out = first_seen_dedup(stream.select(F.md5("text").alias("fp"), "doc_id", "wave"))
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r["fp"][:4]: (r["doc_id"], r["wave"])
        for r in spark.table("dedup_test").collect()
    }
    import hashlib

    fp = lambda t: hashlib.md5(t.encode()).hexdigest()[:4]
    assert got == {
        fp("aa"): (1, 0),  # min doc_id of the duplicated wave-0 pair
        fp("bb"): (2, 0),
        fp("cc"): (3, 0),
        fp("dd"): (14, 1),  # wave-1-only key still emits
    }


def test_append_watermark_exact_boundary(spark, tmp_path):
    """Pin Spark's append-mode eviction when the watermark lands EXACTLY on
    a window end (r3 ADVICE: the equality case was untested): with
    max(ts) = 02:30:00 and a 30-minute watermark, the watermark is exactly
    02:00:00 — the [01:00, 02:00) window's end. The streaming_window_append
    oracle uses window_end <= watermark (inclusive); this test fails if
    Spark's semantics ever disagree."""
    import uuid

    rows = [
        (1, "2024-01-01 00:10:00", "a"),  # window [00:00, 01:00)
        (2, "2024-01-01 01:10:00", "a"),  # window [01:00, 02:00) — boundary
        (3, "2024-01-01 02:30:00", "a"),  # max ts; watermark = 02:00:00
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts_s string, event_type string").select(
        "event_id", F.to_timestamp("ts_s").alias("ts"), "event_type"
    )
    inbox = str(tmp_path / "inbox")
    ev.coalesce(1).write.parquet(inbox)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, event_type string"
    ).parquet(inbox)
    sink = f"bnd_{uuid.uuid4().hex[:8]}"
    q = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = {
        r["ws"]
        for r in spark.table(sink)
        .select(F.date_format("w.start", "HH:mm").alias("ws"))
        .collect()
    }
    # oracle predicate: end <= watermark -> 00:00 window (end 01:00 <= 02:00)
    # AND 01:00 window (end 02:00 <= 02:00) emitted; 02:00 window withheld
    assert emitted == {"00:00", "01:00"}, (
        f"Spark append-mode emitted {emitted}; the streaming_window_append "
        "oracle assumes window_end <= watermark (inclusive) — align the "
        "oracle's comparison operator to the observed semantics"
    )
