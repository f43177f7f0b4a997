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
