"""Local-mode task-retry fidelity (session.py local[N,F] masters).

A transient Python-worker death aborts a whole job under plain local[N]
(maxFailures=1), while a real cluster retries the task up to
spark.task.maxFailures=4. The session factory mirrors that by building
local[N,4] masters; these tests pin the master string and prove a task
that fails transiently on its first attempt is retried to success —
the exact failure mode that killed a full-scale bench leg (a pyspark
daemon fork crash mid-parquet-write).
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_master_carries_retry_budget(spark):
    """The shared test session itself must run with a retry budget."""
    master = spark.sparkContext.master
    assert master.startswith("local["), master
    n, _, retries = master[len("local["):-1].partition(",")
    assert retries, f"master {master} has no task-retry budget"
    assert int(retries) >= 2


def test_retry_env_knob(monkeypatch):
    """SPARK_GRAFT_TASK_RETRIES shapes the master string (no session built
    — getOrCreate would return the live session and mask the master)."""
    from log_parser_spark import session as sess

    monkeypatch.setenv("SPARK_GRAFT_TASK_RETRIES", "7")
    # reproduce the factory's master construction path
    retries = int(os.environ.get("SPARK_GRAFT_TASK_RETRIES", "4"))
    assert retries == 7
    src = open(sess.__file__).read()
    assert 'f"local[{cores},{retries}]"' in src


def test_transient_task_failure_is_retried(spark):
    """A pandas UDF that raises on each task's FIRST attempt (tracked via
    an attempt-marker file per partition) must still produce a full,
    correct result under the retry budget."""
    marker_dir = tempfile.mkdtemp(prefix="retry_markers_")

    @F.pandas_udf(T.LongType())
    def flaky_double(x: pd.Series) -> pd.Series:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        marker = os.path.join(marker_dir, f"p{ctx.partitionId()}")
        if not os.path.exists(marker):
            open(marker, "w").close()
            raise RuntimeError("injected transient failure (first attempt)")
        return x * 2

    df = spark.range(0, 1000, numPartitions=4).select(
        F.col("id"), flaky_double("id").alias("doubled"))
    rows = df.agg(F.count("*").alias("n"),
                  F.sum("doubled").alias("s")).collect()[0]
    assert rows["n"] == 1000
    assert rows["s"] == 2 * sum(range(1000))
    # every partition must have burned exactly one failed attempt
    assert len(os.listdir(marker_dir)) == 4


def test_permanent_failure_still_fails(spark):
    """Retries bound, not mask, real bugs: a task that fails every attempt
    must surface the error after the budget is exhausted."""

    @F.pandas_udf(T.LongType())
    def always_broken(x: pd.Series) -> pd.Series:
        raise RuntimeError("permanent failure")

    df = spark.range(0, 10, numPartitions=1).select(always_broken("id"))
    with pytest.raises(Exception, match="permanent failure"):
        df.collect()
