"""Threshold alerts (F9, SURVEY.md §2.3) — post-aggregate filters joined
against the broadcast threshold config, unioned into one alerts frame.

Reference: ~20 hand-coded comparisons appending strings to 00_Alert.txt
(webAccessLogParser.sh:857-859,912-914,958-968,1032-1034,1187-1190;
websphereLogParser.sh:364-377,422-435,510-524; webErrorLogParser.sh:182-190,
236-241,332-334; javaGCStatsParser.sh:481-488,499-510,546-548).

Rebuild: each alert family is `agg.filter(metric > threshold)` projected to a
common (metric, scope, observed, threshold, message) schema — FIXTURES.md §4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ALERT_SCHEMA = ["metric", "scope", "observed", "threshold", "message"]


def _mk(df: DataFrame, metric: str, scope_col: str, observed_col: str, th: float, msg: str) -> DataFrame:
    return (
        df.filter(F.col(observed_col) > F.lit(th))
        .select(
            F.lit(metric).alias("metric"),
            F.col(scope_col).cast("string").alias("scope"),
            F.col(observed_col).cast("double").alias("observed"),
            F.lit(float(th)).alias("threshold"),
            F.format_string(msg, F.col(scope_col).cast("string"), F.col(observed_col).cast("string")).alias("message"),
        )
    )


def thresholds_dict(thresholds: DataFrame) -> dict[tuple[str, str], float]:
    """Collect the (tiny) threshold table to a driver dict — the reference
    loads it into an AWK array in BEGIN (webAccessLogParser.sh:183-192);
    last row wins on duplicates."""
    out: dict[tuple[str, str], float] = {}
    for r in thresholds.collect():
        out[(r["property"], r["target"])] = float(r["value"])
    return out


def build_alerts(
    th: dict[tuple[str, str], float],
    daily: DataFrame | None = None,
    uri_agg: DataFrame | None = None,
    server_err: DataFrame | None = None,
    mpm_peak: DataFrame | None = None,
    was_event_counts_by_server: DataFrame | None = None,
    tto: DataFrame | None = None,
    starv: DataFrame | None = None,
    hung: DataFrame | None = None,
    gc_daily: DataFrame | None = None,
    route_meta: DataFrame | None = None,
    maxclients: DataFrame | None = None,
) -> DataFrame | None:
    """Union all violation families present. Any input may be None."""
    parts: list[DataFrame] = []

    if maxclients is not None:
        # webErrorLogParser.sh:243-247: EVERY 'approaching MaxClients' line
        # goes straight to the alert file — no threshold config involved;
        # the observed/limit pair comes from the event itself.
        parts.append(
            maxclients.select(
                F.lit("httpApproachMaxClients").alias("metric"),
                F.col("source").cast("string").alias("scope"),
                F.col("maxclients_cur").cast("double").alias("observed"),
                F.col("maxclients_max").cast("double").alias("threshold"),
                F.format_string(
                    "server %s approaching MaxClients (%s/%s)",
                    F.col("source"),
                    F.col("maxclients_cur").cast("string"),
                    F.col("maxclients_max").cast("string"),
                ).alias("message"),
            )
        )

    if daily is not None:
        t = th.get(("httpAvgRespTimeTh", "http"), 2.5)
        parts.append(_mk(daily.withColumn("scope", F.lit("daily")), "httpAvgRespTimeTh",
                         "scope", "art", t, "avg resp time %2$s exceeds threshold (scope %1$s)"))
    if uri_agg is not None:
        t = th.get(("httpAvgRespTimeByTranTh", "http"), 3.0)
        parts.append(_mk(uri_agg, "httpAvgRespTimeByTranTh", "uri", "art", t,
                         "transaction %1$s avg resp time %2$s exceeds threshold"))
    if server_err is not None:
        t = th.get(("httpErrorCountTh", "http.err"), 3500)
        parts.append(_mk(server_err, "httpErrorCountTh", "web_server", "err_cnt", t,
                         "server %1$s error count %2$s exceeds threshold"))
    if mpm_peak is not None:
        t = th.get(("httpMpmStBsyCountTh", "http.mpmstat"), 100)
        parts.append(_mk(mpm_peak, "httpMpmStBsyCountTh", "web_server", "bsy", t,
                         "server %1$s peak busy %2$s exceeds threshold"))
    if tto is not None:
        for cls in ["was.App", "was.Bat"]:
            t = th.get(("wasTranTmOutCntTh", cls), 3)
            scoped = tto.filter(_scope_pred(cls))
            parts.append(_mk(scoped, "wasTranTmOutCntTh", "jvm", "tto_cnt", t,
                             "JVM %1$s txn timeout count %2$s exceeds threshold"))
    if starv is not None:
        for cls in ["was.App", "was.Bat"]:
            t = th.get(("wasCPUStarvCntTh", cls), 3)
            parts.append(_mk(starv.filter(_scope_pred(cls)), "wasCPUStarvCntTh", "jvm",
                             "starv_cnt", t, "JVM %1$s CPU starvation count %2$s exceeds threshold"))
    if hung is not None:
        for cls in ["was.App", "was.Bat"]:
            t = th.get(("wasHungThrdCntTh", cls), 3)
            parts.append(_mk(hung.filter(_scope_pred(cls)), "wasHungThrdCntTh", "jvm",
                             "nhtc", t, "JVM %1$s hung thread count %2$s exceeds threshold"))
    if gc_daily is not None:
        for cls, pfx in [("jvm.App", "jvmapp"), ("jvm.Bat", "jvmbat")]:
            tg = th.get(("gcDlyCountTh", cls), 800)
            tf = th.get(("fgcDlyCountTh", cls), 10)
            scoped = gc_daily.filter(F.col("jvm").startswith(pfx))
            parts.append(_mk(scoped, "gcDlyCountTh", "jvm", "gc_cnt", tg,
                             "JVM %1$s daily GC count %2$s exceeds threshold"))
            parts.append(_mk(scoped, "fgcDlyCountTh", "jvm", "fgc_cnt", tf,
                             "JVM %1$s daily FullGC count %2$s exceeds threshold"))

    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _scope_pred(cls: str):
    """was.App -> wasprod*, was.Bat -> wasbat* (the reference scopes thresholds
    by server-name prefix, websphereLogParser.sh:351)."""
    return F.col("jvm").startswith("wasprod" if cls.endswith("App") else "wasbat")
