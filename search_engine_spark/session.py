"""SparkSession factory tuned for this engine.

Local mode stands in for a multi-executor cluster; all scale-sensitive choices
(shuffle partition counts, AQE, Arrow batching) are made explicitly so the same
code runs unchanged under ``spark-submit --py-files`` on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "search_engine_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cpus`` controls local parallelism (``local[cpus]``); on a real cluster the
    master is taken from the environment and this arg is ignored by Spark.
    """
    # numpy's BLAS must not self-parallelize inside python workers: N
    # concurrent workers x M BLAS threads oversubscribes the box (measured:
    # the 1M-vector IVF Lloyd pass burned 3,365 s of executor time on a
    # ~128-GFlop matmul).  The workers ARE the parallelism; one BLAS thread
    # each.  setdefault so an explicit user setting wins, and set before the
    # JVM launches so workers inherit it (numpy reads these at load time).
    for var in (
        "OPENBLAS_NUM_THREADS",
        "OMP_NUM_THREADS",
        "MKL_NUM_THREADS",
        "NUMEXPR_NUM_THREADS",
    ):
        os.environ.setdefault(var, "1")
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # 3 tasks per core: stragglers amortize across waves instead of
        # setting the stage time (1 task/core makes the slowest task the
        # stage); AQE coalesces the excess when partitions run small.
        shuffle_partitions = max(3 * cpus, 24)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
        # GB-scale local corpora need more than filesize/128MB scan splits to
        # feed every core; harmless on small inputs, overridden on clusters.
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
