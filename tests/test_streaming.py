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
