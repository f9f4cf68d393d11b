"""SparkSession factory with the engine's tuned defaults.

Tuned for correctness at small scale and a plan shape that survives 100 TB:
AQE on (runtime broadcast conversion + skew-join splitting), explicit
shuffle-partition sizing, Arrow enabled for the pandas-UDF kernels.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_spark(
    app_name: str = "sage-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: one shuffle partition per core keeps every stage busy
        # without tiny-task overhead; on a real cluster this is set to
        # ~2-3x total executor cores via spark-submit conf.
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # unix-domain sockets for the Python runners: measurably removes
        # TCP-loopback handshake stalls at >16 concurrent workers here
        .config("spark.python.unix.domain.socket.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # JSON-blob-heavy tables (grounding/payload) compress ~10x under
        # zstd; staging I/O is disk-bound otherwise
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.shuffle.compress", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SAGE_SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
