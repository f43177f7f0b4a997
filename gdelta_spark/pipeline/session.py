"""SparkSession factory with the engine's required configs."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "gdelta-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        # Arrow is the JVM<->Python vector boundary: required for the
        # zero-per-row-Python contract
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # big Arrow batches: the JVM ArrowWriter's per-batch flush dominates
        # at small sizes (measured 2.7x wall difference on a 1.76 GB corpus)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        # coalesce post-shuffle partitions by SIZE, not to defaultParallelism:
        # with the default parallelismFirst=true every tiny shuffle keeps
        # ~#cores reduce tasks, so a query tree of K exchanges schedules
        # K * cores near-empty tasks (guide §2.2: fewer, larger partitions).
        # The advisory target is parameterised: 8 MiB locally keeps the
        # Python-kernel stages (applyInPandas encode, ~0.05 GB/s/core)
        # parallel at bench scale — partition count stays ceil(bytes/8MiB),
        # which GROWS with input size; a production cluster raises it to
        # 64-256 MiB for JVM-only shuffle-heavy jobs (same knob, env).
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_MB", "8") + "m",
        )
        # prefer hash joins over sort-merge when the build side fits
        # (guide §3.1): the planner may choose shuffled-hash outright, and
        # AQE rewrites SMJ -> SHJ at runtime when every post-shuffle
        # partition is under the local-map threshold — skips both sorts
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
        # parquet writes of many small partitions: keep task overhead low
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
    )
    # shuffle/spill on tmpfs when available (measured 2.5x disk bandwidth);
    # on a real cluster this is the usual fast local-disk setting
    if os.path.isdir("/dev/shm"):
        b = b.config("spark.local.dir", "/dev/shm/spark-local")
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
