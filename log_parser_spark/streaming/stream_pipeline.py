"""Structured-Streaming flavor of the pipeline (SURVEY.md §2.8).

The reference is a daily batch job; its streaming-shaped behaviors map to:

  daily batch window / replay of past dates   -> file-source stream +
                                                 checkpointed exactly-once sinks
  hourly tumbling buckets (sh:314,730-750)    -> window(ts, '1 hour') with
                                                 watermark for late lines
  alert append to 00_Alert.txt (S9)           -> threshold filter on the
                                                 windowed aggregate stream
  history append-per-day (S8)                 -> foreachBatch append

The parse stage is the SAME fused Arrow kernel as batch
(operators/parse.fused_parse) — mapInPandas composes with readStream
unchanged, which is exactly why the batch pipeline was built DataFrame-first.

Scale notes: the file source lists only new files per trigger (at 100 TB an
Iceberg/Kafka source replaces it — same downstream graph). State for the
windowed aggregate is bounded by the watermark; sink fan-out stays
partitionBy("category") so a streaming run materializes the same silver
layout as batch.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.parse import fused_parse
from ..sources.token_table import TOKEN_SCHEMA_DDL


def read_token_stream(
    spark: SparkSession,
    dataset_dir: str | Path,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """File-source stream over the token table (new files = new micro-batch)."""
    return (
        spark.readStream.schema(TOKEN_SCHEMA_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("basePath", str(Path(dataset_dir) / "token_sequences"))
        .parquet(str(Path(dataset_dir) / "token_sequences"))
    )


def parse_stream(stream: DataFrame) -> DataFrame:
    """Streaming parse = the batch fused kernel, unchanged."""
    return fused_parse(stream, keep_tokens=False)


def _with_event_ts(parsed: DataFrame) -> DataFrame:
    """Event time from the parsed per-family date/hour columns."""
    event_date = F.coalesce(
        F.col("a_event_date"), F.col("w_event_date"),
        F.col("e_event_date"), F.col("g_event_date"),
    )
    hour = F.coalesce(F.col("a_hour"), F.col("w_hour"), F.col("e_hour"), F.col("g_hour"))
    return parsed.withColumn(
        "event_ts",
        F.try_to_timestamp(
            F.concat_ws(" ", event_date, F.lpad(hour.cast("string"), 2, "0")),
            F.lit("yyyy-MM-dd HH"),
        ),
    )


def hourly_windowed_counts(parsed: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """A5's hourly matrix as a watermarked tumbling-window aggregate.

    Late lines within the watermark update their hour bucket; beyond it the
    state is evicted (bounded state — the 10^12-scale requirement).
    """
    return (
        _with_event_ts(parsed)
        .filter(F.col("event_ts").isNotNull())
        .withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", "1 hour").alias("w"), "category")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.when(F.col("family") == "access", F.col("a_rt"))).alias("sum_rt"),
        )
        .select(F.col("w.start").alias("hour_start"), "category", "cnt", "sum_rt")
    )


def alert_stream(parsed: DataFrame, error_count_th: int = 100,
                 watermark: str = "2 hours") -> DataFrame:
    """F9/S9 as a stream: per-window per-source error counts over threshold."""
    return (
        _with_event_ts(parsed)
        .filter(F.col("event_ts").isNotNull() & (F.col("category") == "error"))
        .withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", "1 hour").alias("w"), "source")
        .agg(F.count("*").alias("error_cnt"))
        .filter(F.col("error_cnt") > error_count_th)
        .select(
            F.col("w.start").alias("hour_start"), "source", "error_cnt",
            F.lit(error_count_th).alias("threshold"),
        )
    )


def start_sink_stream(parsed: DataFrame, out_dir: str | Path,
                      checkpoint_dir: str | Path | None = None):
    """Stream the routed rows into the partitioned silver sinks.

    Exactly-once via the checkpoint + file-sink commit log — the streaming
    twin of AtomicTable's txid manifest.
    """
    out = Path(out_dir)
    cp = Path(checkpoint_dir) if checkpoint_dir else out / "_checkpoint"
    return (
        parsed.writeStream.format("parquet")
        .option("path", str(out / "sinks"))
        .option("checkpointLocation", str(cp))
        .partitionBy("category")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def sessionization_stream(parsed: DataFrame) -> DataFrame:
    """J5 as a CUSTOM STATEFUL streaming operator via applyInPandasWithState.

    Per (clone_id, jsession, uid) group the state holds the last-seen login
    epoch; a logout emits the closed session with its duration, and an idle
    group is closed by processing-time timeout with a null logout — the
    streaming twin of batch `aggregates.sessionization` (reference
    webAccessLogParser.sh:715-720,1273-1295), with state bounded by the
    timeout instead of growing with the corpus.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..functions import patterns as P

    from ..operators.aggregates import (
        SESSION_LOGIN_URI, SESSION_LOGOUT_URI)

    is_login = F.col("a_uri_path") == SESSION_LOGIN_URI
    is_logout = (F.col("a_uri_path") == SESSION_LOGOUT_URI) & F.col(
        "a_params").rlike("logout=true")
    access = parsed.filter(
        (F.col("family") == "access")
        & (F.col("a_jsession") != "-")
        & (is_login | is_logout)
    ).select(
        F.col("a_clone_id").alias("clone_id"),
        F.col("a_jsession").alias("jsession"),
        F.col("a_uid").alias("uid"),
        F.unix_timestamp(
            F.to_timestamp(F.col("a_ts_raw"), P.ACCESS_TS_FMT)).alias("epoch"),
        is_login.alias("is_login"),
    )

    out_schema = (
        "clone_id string, jsession string, uid string, "
        "login_epoch long, logout_epoch long, duration_s long, closed_by string"
    )
    state_schema = "login_epoch long"

    def fn(key, pdfs, state: GroupState):
        clone_id, jsession, uid = key
        if state.hasTimedOut:
            (login_epoch,) = state.get
            state.remove()
            yield pd.DataFrame([{
                "clone_id": clone_id, "jsession": jsession, "uid": uid,
                "login_epoch": login_epoch, "logout_epoch": None,
                "duration_s": None, "closed_by": "timeout",
            }])
            return
        login = state.get[0] if state.exists else None
        rows = []
        for pdf in pdfs:
            for r in pdf.sort_values("epoch").itertuples():
                if r.is_login:
                    login = int(r.epoch)  # awk overwrite: last login wins
                elif login is not None:
                    rows.append({
                        "clone_id": clone_id, "jsession": jsession, "uid": uid,
                        "login_epoch": login, "logout_epoch": int(r.epoch),
                        "duration_s": int(r.epoch) - login,
                        "closed_by": "logout",
                    })
                    login = None
        if login is not None:
            state.update((login,))
            state.setTimeoutDuration(60 * 1000)
        elif state.exists:
            state.remove()
        yield pd.DataFrame(rows, columns=[
            "clone_id", "jsession", "uid", "login_epoch", "logout_epoch",
            "duration_s", "closed_by"])

    return access.groupBy("clone_id", "jsession", "uid").applyInPandasWithState(
        fn, out_schema, state_schema, "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )
