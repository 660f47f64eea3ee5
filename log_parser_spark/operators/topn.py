"""Top-K / sorted reports (T1-T10, SURVEY.md §2.6).

The reference pipes temp files through external `sort | awk NR<=K`
(webAccessLogParser.sh:1300-1513). Spark-first: `orderBy(...).limit(k)`
compiles to TakeOrderedAndProject — a per-partition heap + driver merge,
no full sort materialization, no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import aggregates as A


def top_slowest_requests(access: DataFrame, k: int = 10) -> DataFrame:
    """T1: top-K slowest requests, whole rows (webAccessLogParser.sh:1300-1329)."""
    return (
        access.select("doc_id", "source", "uri_path", "uid", "status", "rt", "hour")
        .orderBy(F.desc("rt"), "doc_id")
        .limit(k)
    )


def top_uris_by_art(access: DataFrame, k: int = 10) -> DataFrame:
    """T2: top-K URIs by average response time (webAccessLogParser.sh:1331-1356)."""
    return A.uri_stats(access).orderBy(F.desc("art"), "uri").limit(k)


def top_error_urls(access: DataFrame, k: int = 10) -> DataFrame:
    """T3: top-K 400+ URLs by count (webAccessLogParser.sh:1357-1381)."""
    return A.errors_by_uri(access).orderBy(F.desc("cnt"), "uri", "status").limit(k)


def top_domains_by_art(access: DataFrame, k: int = 5) -> DataFrame:
    """T4a: top-K domains by avg rt (webAccessLogParser.sh:1383-1412)."""
    return A.domain_stats(access).orderBy(F.desc("art"), "domain").limit(k)


def top_uids_by_art(access: DataFrame, k: int = 5) -> DataFrame:
    """T4b: top-K UIDs by avg rt (webAccessLogParser.sh:1413-1438)."""
    return A.uid_stats(access).orderBy(F.desc("art"), "uid").limit(k)


def sorted_ext_report(access: DataFrame) -> DataFrame:
    """T5: full per-extension listing sorted by count desc (webAccessLogParser.sh:1440-1461)."""
    return A.ext_stats(access).orderBy(F.desc("cnt"), "ext")


def was_top_events(was: DataFrame, dim: str, severities: list[str], k: int = 10) -> DataFrame:
    """T6: WAS top-K report families — (cmp|class|exception|msg_code) x
    (err|warn) (websphereLogParser.sh:673-836)."""
    return (
        was.filter(F.col("evt").isin(severities))
        .filter(F.col(dim) != "")
        .groupBy(dim)
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), dim)
        .limit(k)
    )


def hung_threads_ordered(was: DataFrame) -> DataFrame:
    """T7: multi-key sort of hung-thread events (websphereLogParser.sh:444)."""
    return (
        was.filter(F.col("msg_code").isin("WSVR0605W", "WSVR0606W"))
        .select("source", "event_date", "hour", "time", "msg_code", "hthread_id", "chtc")
        .orderBy("source", "event_date", "hour", "time", "msg_code")
    )


def mpm_ordered(err: DataFrame) -> DataFrame:
    """T8: mpm time series sorted (server, hour, time) (webErrorLogParser.sh:352)."""
    return (
        err.filter(F.col("subtype") == "mpm_global")
        .select("source", "event_date", "hour", "time", "rdy", "bsy", "rd", "wr", "ka")
        .orderBy("source", "hour", "time")
    )


def gc_ordered(gc: DataFrame) -> DataFrame:
    """T9: GC summary sort (jvm, date) (javaGCStatsParser.sh:561)."""
    return A.gc_daily_stats(gc)  # already ordered (jvm, date)


def whereuid(access: DataFrame, uid: str) -> DataFrame:
    """T10: all requests of one user ordered by time (webAccessLogParser.sh:168,1293)."""
    return (
        access.filter(F.col("uid") == uid)
        .select("uid", "ts_raw", "uri_path", "status", "rt", "source")
        .orderBy("ts_raw", "uri_path")
    )
