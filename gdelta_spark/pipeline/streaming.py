"""Structured-Streaming incremental encode.

New token files landing under a directory are encoded into the warehouse as
they arrive: ``readStream`` file source -> ``foreachBatch`` -> the same
``encode_and_commit`` used by the batch job. Exactly-once comes from two
layers: Spark's streaming checkpoint replays a failed micro-batch, and the
warehouse's manifest anti-join makes the replay skip partitions it already
committed (micro-batch part_ids are scoped by batch id so concurrent batches
never collide).

The reference has no streaming surface (SURVEY §2.2); this is engine-side,
required for a pipeline that continuously ingests training shards.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from gdelta_spark.pipeline.generator import TOKENS_SCHEMA
from gdelta_spark.pipeline.warehouse import encode_and_commit


def incremental_encode(
    spark: SparkSession,
    input_dir: str,
    warehouse_root: str,
    checkpoint_dir: str,
    group_bytes: int | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start (and return) the streaming query. ``available_now=True`` drains
    the current backlog then stops — the batch-ingest-shaped usage; leave it
    False for a continuous daemon."""
    reader = (
        spark.readStream.schema(TOKENS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger or 64)
        .parquet(input_dir)
    )

    summaries: list[dict] = []

    def process(batch_df, batch_id: int) -> None:
        s = encode_and_commit(
            batch_df.sparkSession,
            batch_df,
            warehouse_root,
            group_bytes=group_bytes,
            part_prefix=f"batch={batch_id:06d}/",
        )
        summaries.append({"batch_id": batch_id, **s})

    writer = reader.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
    else:
        q = writer.start()
    q._gdelta_summaries = summaries  # introspection for tests/jobs
    return q


def first_seen_dedup(stream_df, key_col: str = "fp"):
    """Stateful streaming exact-dedup: per content fingerprint, emit ONE
    surviving row — the min-(wave, doc_id) row of the first micro-batch the
    key appears in — and suppress every later duplicate across batches.

    The custom stateful operator the reference's batch-only surface lacks:
    ``applyInPandasWithState`` keyed by the fingerprint keeps one tiny state
    record (rows seen) per distinct document. State shards with the group-by
    key across executors (RocksDB state store in production), so memory per
    executor is |distinct keys|/|executors| — the only shape that survives a
    continuously-ingesting 100 TB corpus. Dedup decisions inside a batch are
    order-free (min over (wave, doc_id)), so the emitted set is deterministic
    for any batching that respects wave arrival order.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        best = None
        n = 0
        for pdf in pdfs:
            n += len(pdf)
            cand = pdf.sort_values(["wave", "doc_id"]).iloc[0]
            if best is None or (cand["wave"], cand["doc_id"]) < (
                best["wave"],
                best["doc_id"],
            ):
                best = cand
        if state.exists:
            (seen,) = state.get
            state.update((seen + n,))
            return iter(())  # duplicate of an already-emitted key
        state.update((n,))
        yield pd.DataFrame(
            [{"fp": key[0], "doc_id": int(best["doc_id"]), "wave": int(best["wave"])}]
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType="fp string, doc_id long, wave int",
        stateStructType="n_seen long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
