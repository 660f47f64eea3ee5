"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we would set on a real cluster: AQE on
(runtime skew/coalesce re-planning), shuffle partitions sized to cores
(not the 200 default), Arrow enabled for the pandas-UDF parse kernel,
UTC session timezone so results compare bit-exactly against DuckDB oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | str | None = None,
    app_name: str = "tokenlog-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores: int N -> local[N]; "*" -> local[*]; None -> $SPARK_GRAFT_CPUS or *.
    shuffle_partitions defaults to the core count — on a real cluster this
    would be ~2-3x total executor cores; AQE coalesces down at runtime.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    # local[N, F]: F = per-task retry budget. Plain local[N] defaults to
    # maxFailures=1, so ONE transient Python-worker crash (observed: the
    # pyspark daemon fork dying mid-write, ~1 in 10 SF=2 pipeline legs)
    # aborts the whole job — a real cluster would just retry the task
    # (spark.task.maxFailures defaults to 4 there). Mirror that here.
    retries = int(os.environ.get("SPARK_GRAFT_TASK_RETRIES", "4"))
    master = f"local[{cores},{retries}]"
    n_cores = (os.cpu_count() or 8) if cores == "*" else int(cores)
    if shuffle_partitions is None:
        shuffle_partitions = max(8, n_cores)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # smaller input splits locally: task waves stay balanced even when
        # hive files are uneven (hot source); 128m is the cluster default
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MPB", "32m"))
        # dynamic-partition writes: keep N open writers per task instead of
        # sorting every task's rows by partition key first — the sink
        # fan-out has only 4 categories, so the sort is pure overhead
        .config("spark.sql.maxConcurrentOutputFileWriters", "8")
        # v2 committer: task commit moves files directly — removes the
        # driver-serial job-commit rename loop (matters for the many small
        # report snapshots; on a real cluster an Iceberg commit replaces this)
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.hadoop.parquet.summary.metadata.level", "NONE")
        # dump a Python traceback when an Arrow worker dies instead of the
        # opaque "Python worker exited unexpectedly" — zero cost until a crash
        .config("spark.python.worker.faulthandler.enabled", "true")
        .config("spark.sql.execution.pyspark.udf.faulthandler.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
