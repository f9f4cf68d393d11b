"""SparkSession factory with the engine's tuned defaults.

Tuned for correctness at small scale and a plan shape that survives 100 TB:
AQE on (runtime broadcast conversion + skew-join splitting), explicit
shuffle-partition sizing, Arrow enabled for the pandas-UDF kernels.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _under_spark_submit(environ: os._Environ[str] | dict[str, str]) -> bool:
    """True when this Python process was launched BY spark-submit (the JVM
    starts first and spawns Python with the gateway coordinates). In that
    case the cluster manager / master / sizing come from the submit command
    line, and app code must NOT override them — ``.master()`` in code wins
    over ``--master``, which would silently force a YARN/k8s submission back
    to local mode."""
    return "PYSPARK_GATEWAY_PORT" in environ or "PYSPARK_GATEWAY_SECRET" in environ


def resolve_session_shape(
    master: str | None,
    shuffle_partitions: int | None,
    environ: os._Environ[str] | dict[str, str],
) -> tuple[str | None, int | None, bool]:
    """Decide (master, shuffle_partitions, submitted) for build_spark.

    Explicit arguments always win. Otherwise: standalone Python gets
    local[SPARK_GRAFT_CPUS or cpu_count] with one shuffle partition per
    core, while a process launched by spark-submit leaves both unset so the
    submit command line / cluster defaults govern — the shuffle-partition
    fallback in particular must never pin a 1000-executor job to the DRIVER
    host's core count."""
    submitted = _under_spark_submit(environ)
    cpus = environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    if master is None and not submitted:
        master = f"local[{cpus}]"
    if shuffle_partitions is None and not submitted:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    return master, shuffle_partitions, submitted


def build_spark(
    app_name: str = "sage-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master, shuffle_partitions, submitted = resolve_session_shape(
        master, shuffle_partitions, os.environ
    )

    builder = (
        SparkSession.builder.appName(app_name)
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
        .config("spark.ui.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    if not submitted:
        # under spark-submit the driver JVM already exists; driver memory can
        # only come from the submit command line, so setting it here is noise
        builder = builder.config(
            "spark.driver.memory", os.environ.get("SAGE_SPARK_DRIVER_MEM", "16g")
        )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
