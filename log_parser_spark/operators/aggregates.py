"""Aggregate library: A1-A25 (SURVEY.md §2.5) as DataFrame transformations.

Every function takes an already-parsed family DataFrame (see
operators/parse.parsed_family) and returns a result DataFrame with stable
snake_case column aliases — the same names used by the DuckDB oracle SQL so
value-hash comparison is name-aligned.

All are single-shuffle hash aggregates; grouping-set families that the
reference computes as parallel AWK arrays in one pass (A5/A6/A11) are
expressed as conditional aggregates so Spark's partial aggregation
(map-side combine) keeps the shuffle narrow. Pivots use FIXED column lists
(webAccessLogParser.sh:796-799 does the same) so the plan stays static —
no extra pass to discover pivot values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.buckets import RANGE_LABELS, is_excluded_static
from ..functions import patterns as P

FIXED_METHODS = P.HTTP_METHODS
FIXED_STATUS = [
    100, 101, 200, 201, 202, 204, 206, 301, 302, 303, 304, 307, 308,
    400, 401, 403, 404, 405, 408, 409, 410, 412, 413, 414, 416, 500,
    501, 502, 503, 504,
]


def _xcl(df: DataFrame) -> DataFrame:
    """Attach the F4 static-content exclusion flag (webAccessLogParser.sh:742)."""
    return df.withColumn(
        "excluded",
        is_excluded_static(F.col("status"), F.col("ext"), F.col("uri_path"), F.col("params")),
    )


# ---------------------------------------------------------------- access

def discard_summary(classified: DataFrame, access: DataFrame) -> DataFrame:
    """Reference's distinct `.discarded` and `.unknownua` side-file counts
    as one report (webAccessLogParser.sh:646-653,680-683): per-subtype
    unmatched counts (curl / no_uid / parse_miss / garbage) plus the count
    of PARSED access records whose UA fell through the 16-case classifier
    (those are kept in the access sink with browser='Other', exactly like
    the reference keeps processing them — unknownua is a review count, not
    a discard)."""
    reasons = (
        classified.filter(F.col("category") == "unmatched")
        .groupBy(F.col("discard_reason").alias("reason"))
        .agg(F.count("*").alias("cnt"))
    )
    unk = access.filter(F.col("browser") == "Other").select(
        F.lit("unknownua").alias("reason")
    ).groupBy("reason").agg(F.count("*").alias("cnt"))
    return reasons.unionByName(unk).orderBy("reason")


def status_counts(access: DataFrame) -> DataFrame:
    """A1: count by HTTP response code + pct of total
    (webAccessLogParser.sh:723,1176-1184)."""
    w = Window.partitionBy()
    return (
        access.groupBy("status")
        .agg(F.count("*").alias("cnt"))
        .withColumn("pct", F.round(F.col("cnt") / F.sum("cnt").over(w) * 100.0, 2))
        .orderBy("status")
    )


def uri_stats(access: DataFrame) -> DataFrame:
    """A2: per-URI count/sum/avg/min/max response time + per-range counts
    (webAccessLogParser.sh:725-727,771-788,1002-1024)."""
    aggs = [
        F.count("*").alias("cnt"),
        F.round(F.sum("rt"), 6).alias("sum_rt"),
        F.round(F.avg("rt"), 6).alias("art"),
        F.min("rt").alias("min_rt"),
        F.max("rt").alias("max_rt"),
    ] + [
        F.sum(F.when(F.col("range") == lbl, 1).otherwise(0)).alias(f"r{i+1}_cnt")
        for i, lbl in enumerate(RANGE_LABELS)
    ]
    return access.groupBy(F.col("uri_path").alias("uri")).agg(*aggs).orderBy("uri")


def distinct_users_daily(access: DataFrame) -> DataFrame:
    """A3 (daily): exact distinct UIDs (webAccessLogParser.sh:687,883-888).
    At 10^12 scale switch to approx_count_distinct — exact needed for parity."""
    return access.agg(F.countDistinct("uid").alias("uuc"))


def distinct_users_hourly(access: DataFrame) -> DataFrame:
    """A3 (hourly): distinct UIDs per hour (webAccessLogParser.sh:689)."""
    return access.groupBy("hour").agg(F.countDistinct("uid").alias("uuc")).orderBy("hour")


def distinct_sessions(access: DataFrame) -> DataFrame:
    """A4: distinct (clone_id, jsession) pairs, daily + per web server
    (webAccessLogParser.sh:700-713)."""
    with_sess = access.filter(F.col("jsession") != "-")
    return with_sess.agg(
        F.countDistinct("clone_id", "jsession").alias("jsc")
    )


def sessions_per_hour(access: DataFrame) -> DataFrame:
    """A4 (hourly): distinct jsession per hour (webAccessLogParser.sh:700-701;
    hourly arrays keyed (hour, jsession), emitted :1047-1058). All 24 hours
    emit a row (0 when quiet), matching the fixed-width hourly report."""
    agg = (
        access.filter(F.col("jsession") != "-")
        .groupBy("hour")
        .agg(F.countDistinct("jsession").alias("jsc"))
    )
    hours = access.sparkSession.createDataFrame([(h,) for h in range(24)], "hour int")
    return hours.join(agg, "hour", "left").na.fill(0).orderBy("hour")


def domain_hour_sessions(access: DataFrame) -> DataFrame:
    """A15 (session half): domain x hour distinct-session pivot
    (webAccessLogParser.sh:702,916-934 arrHrljSessDmn/arrHrlDmnBySess)."""
    pairs = (
        access.filter(F.col("jsession") != "-")
        .select("domain", "hour", "jsession")
        .distinct()  # dedup first — avoids the 24x distinct-agg Expand
    )
    return (
        pairs.groupBy("domain")
        .pivot("hour", list(range(24)))
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .orderBy("domain")
    )


def domain_daily_summary(access: DataFrame) -> DataFrame:
    """A15 (daily): per-domain uuc (distinct uid) + usc (distinct
    clone+session — clone-qualified like the reference's arrDlyjSessDmn)
    (webAccessLogParser.sh:705-707,1241-1266)."""
    return (
        access.groupBy("domain")
        .agg(
            F.countDistinct("uid").alias("uuc"),
            F.countDistinct(
                F.when(F.col("jsession") != "-", F.struct("clone_id", "jsession"))
            ).alias("usc"),
        )
        .orderBy("domain")
    )


def whereuid_sessions(
    access: DataFrame,
    clone_map: DataFrame,
    login_uri: str | None = None,
    logout_uri: str | None = None,
) -> DataFrame:
    """'Where the user is' report (webAccessLogParser.sh:715-720,1273-1295):
    per (web_server, was, clone_id, jsession, uid) the LAST login time, LAST
    logout time (or null, printed 'na' by the reference) and their diff.
    AWK overwrite semantics -> max_by on file position (doc_id). Boundary
    predicates are exact-path like the reference (see _session_marks)."""
    from .enrich import enrich_clone

    login, logout = _session_marks(
        login_uri or SESSION_LOGIN_URI, logout_uri or SESSION_LOGOUT_URI)
    ts = F.to_timestamp(F.col("ts_raw"), P.ACCESS_TS_FMT)
    df = enrich_clone(
        access.filter(F.col("jsession") != "-").filter(login | logout), clone_map
    )
    return (
        df.groupBy(
            F.col("source").alias("web_server"), "was_server",
            "clone_id", "jsession", "uid",
        )
        .agg(
            F.max_by(ts, F.when(login, F.col("doc_id"))).alias("start_ts"),
            F.max_by(ts, F.when(logout, F.col("doc_id"))).alias("end_ts"),
        )
        .filter(F.col("start_ts").isNotNull())
        .withColumn(
            "diff_s", F.col("end_ts").cast("long") - F.col("start_ts").cast("long")
        )
        .orderBy("web_server", "clone_id", "jsession", "uid")
    )


def sessions_per_server(access: DataFrame) -> DataFrame:
    """A4 per-WS variant: distinct sessions per web server
    (webAccessLogParser.sh:1047-1058)."""
    return (
        access.filter(F.col("jsession") != "-")
        .groupBy(F.col("source").alias("web_server"))
        .agg(F.countDistinct("clone_id", "jsession").alias("jsc"))
        .orderBy("web_server")
    )


def hourly_stats(access: DataFrame) -> DataFrame:
    """A5: hourly perf matrix — incl/xcl counts, avg rt, per-range counts+pct
    (webAccessLogParser.sh:730-750,869-935)."""
    df = _xcl(access)
    aggs = [
        F.count("*").alias("cnt_incl"),
        F.sum(F.when(~F.col("excluded"), 1).otherwise(0)).alias("cnt_xcl"),
        F.round(F.sum(F.when(~F.col("excluded"), F.col("rt")).otherwise(0.0)), 6).alias("sum_rt_xcl"),
        F.countDistinct("uid").alias("uuc"),
    ] + [
        F.sum(F.when(~F.col("excluded") & (F.col("range") == lbl), 1).otherwise(0)).alias(f"r{i+1}_cnt")
        for i, lbl in enumerate(RANGE_LABELS)
    ]
    out = access.sparkSession.createDataFrame([(h,) for h in range(24)], "hour int").join(
        df.groupBy("hour").agg(*aggs), "hour", "left"
    )
    return (
        out.na.fill(0)
        .withColumn(
            "art",
            F.when(F.col("cnt_xcl") > 0, F.round(F.col("sum_rt_xcl") / F.col("cnt_xcl"), 6)).otherwise(0.0),
        )
        .orderBy("hour")
    )


def daily_rollup(access: DataFrame) -> DataFrame:
    """A6: daily grand totals (webAccessLogParser.sh:685,744-754,983-999)."""
    df = _xcl(access)
    aggs = [
        F.count("*").alias("cnt_incl"),
        F.sum(F.when(~F.col("excluded"), 1).otherwise(0)).alias("cnt_xcl"),
        F.round(F.sum(F.when(~F.col("excluded"), F.col("rt")).otherwise(0.0)), 6).alias("sum_rt_xcl"),
        F.countDistinct("uid").alias("uuc"),
        F.countDistinct(F.when(F.col("jsession") != "-", F.struct("clone_id", "jsession"))).alias("jsc"),
    ] + [
        F.sum(F.when(~F.col("excluded") & (F.col("range") == lbl), 1).otherwise(0)).alias(f"r{i+1}_cnt")
        for i, lbl in enumerate(RANGE_LABELS)
    ]
    return df.agg(*aggs).withColumn(
        "art",
        F.when(F.col("cnt_xcl") > 0, F.round(F.col("sum_rt_xcl") / F.col("cnt_xcl"), 6)).otherwise(0.0),
    )


def uid_stats(access: DataFrame) -> DataFrame:
    """A7: per-UID counts, avg rt, per-range counts
    (webAccessLogParser.sh:758-760,972-981)."""
    aggs = [
        F.count("*").alias("cnt"),
        F.round(F.avg("rt"), 6).alias("art"),
    ] + [
        F.sum(F.when(F.col("range") == lbl, 1).otherwise(0)).alias(f"r{i+1}_cnt")
        for i, lbl in enumerate(RANGE_LABELS)
    ]
    return access.groupBy("uid").agg(*aggs).orderBy("uid")


def domain_stats(access: DataFrame) -> DataFrame:
    """A8: per-domain count/sum/avg rt (webAccessLogParser.sh:756-757,1025-1043)."""
    return (
        access.groupBy("domain")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("rt"), 6).alias("sum_rt"),
            F.round(F.avg("rt"), 6).alias("art"),
        )
        .orderBy("domain")
    )


def ext_stats(access: DataFrame) -> DataFrame:
    """A9: per-extension counts + per-range counts
    (webAccessLogParser.sh:732-734,1219-1230)."""
    aggs = [
        F.count("*").alias("cnt"),
        F.round(F.sum("rt"), 6).alias("sum_rt"),
        F.round(F.avg("rt"), 6).alias("art"),
    ] + [
        F.sum(F.when(F.col("range") == lbl, 1).otherwise(0)).alias(f"r{i+1}_cnt")
        for i, lbl in enumerate(RANGE_LABELS)
    ]
    return access.groupBy("ext").agg(*aggs).orderBy("ext")


def browser_usage(access: DataFrame) -> DataFrame:
    """A10: distinct users per browser + pct (webAccessLogParser.sh:735,1201-1208)."""
    w = Window.partitionBy()
    return (
        access.groupBy("browser")
        .agg(F.countDistinct("uid").alias("uuc"))
        .withColumn("pct", F.round(F.col("uuc") / F.sum("uuc").over(w) * 100.0, 2))
        .orderBy(F.desc("uuc"), "browser")
    )


def os_usage(access: DataFrame) -> DataFrame:
    """A10 (OS variant): distinct users per OS (webAccessLogParser.sh:736,1210-1216)."""
    w = Window.partitionBy()
    return (
        access.groupBy("os_name")
        .agg(F.countDistinct("uid").alias("uuc"))
        .withColumn("pct", F.round(F.col("uuc") / F.sum("uuc").over(w) * 100.0, 2))
        .orderBy(F.desc("uuc"), "os_name")
    )


def server_stats(access: DataFrame) -> DataFrame:
    """A11: per-web-server incl/xcl counts, art, range counts, users, sessions
    (webAccessLogParser.sh:738,762-769,1071-1107)."""
    df = _xcl(access)
    aggs = [
        F.count("*").alias("cnt_incl"),
        F.sum(F.when(~F.col("excluded"), 1).otherwise(0)).alias("cnt_xcl"),
        F.round(F.sum(F.when(~F.col("excluded"), F.col("rt")).otherwise(0.0)), 6).alias("sum_rt_xcl"),
        F.countDistinct("uid").alias("uuc"),
        F.countDistinct(F.when(F.col("jsession") != "-", F.struct("clone_id", "jsession"))).alias("jsc"),
    ] + [
        F.sum(F.when(~F.col("excluded") & (F.col("range") == lbl), 1).otherwise(0)).alias(f"r{i+1}_cnt")
        for i, lbl in enumerate(RANGE_LABELS)
    ]
    return (
        df.groupBy(F.col("source").alias("web_server"))
        .agg(*aggs)
        .withColumn(
            "art",
            F.when(F.col("cnt_xcl") > 0, F.round(F.col("sum_rt_xcl") / F.col("cnt_xcl"), 6)).otherwise(0.0),
        )
        .orderBy("web_server")
    )


def was_server_stats(access: DataFrame, clone_map: DataFrame) -> DataFrame:
    """A11 per-WAS analogue via the J1 broadcast enrich
    (webAccessLogParser.sh:739,763-769,1121-1162)."""
    enriched = access.join(F.broadcast(clone_map.select("clone_id", "was_server")), "clone_id", "left")
    df = _xcl(enriched).withColumn("was_server", F.coalesce("was_server", F.lit("UNKNOWN")))
    aggs = [
        F.count("*").alias("cnt_incl"),
        F.sum(F.when(~F.col("excluded"), 1).otherwise(0)).alias("cnt_xcl"),
        F.round(F.sum(F.when(~F.col("excluded"), F.col("rt")).otherwise(0.0)), 6).alias("sum_rt_xcl"),
        F.countDistinct("uid").alias("uuc"),
        F.countDistinct(F.when(F.col("jsession") != "-", F.col("jsession"))).alias("jsc"),
    ]
    return (
        df.groupBy("was_server")
        .agg(*aggs)
        .withColumn(
            "art",
            F.when(F.col("cnt_xcl") > 0, F.round(F.col("sum_rt_xcl") / F.col("cnt_xcl"), 6)).otherwise(0.0),
        )
        .orderBy("was_server")
    )


def method_by_server(access: DataFrame) -> DataFrame:
    """A12: request-method x server matrix, fixed 13-method column list
    (webAccessLogParser.sh:673,794-824)."""
    return (
        access.groupBy(F.col("source").alias("web_server"))
        .pivot("method", FIXED_METHODS)
        .count()
        .na.fill(0)
        .orderBy("web_server")
    )


def status_by_server(access: DataFrame) -> DataFrame:
    """A13: response-code x server matrix, fixed code column list
    (webAccessLogParser.sh:674,799,826-847)."""
    return (
        access.withColumn("status_c", F.concat(F.lit("s"), F.col("status").cast("string")))
        .groupBy(F.col("source").alias("web_server"))
        .pivot("status_c", [f"s{c}" for c in FIXED_STATUS])
        .count()
        .na.fill(0)
        .orderBy("web_server")
    )


def errors_by_uri(access: DataFrame) -> DataFrame:
    """A14: 400+ responses by (uri, status) (webAccessLogParser.sh:669-671,1191-1197)."""
    return (
        access.filter(F.col("status") >= 400)
        .groupBy(F.col("uri_path").alias("uri"), "status")
        .agg(F.count("*").alias("cnt"))
        .orderBy("uri", "status")
    )


def domain_hour_users(access: DataFrame) -> DataFrame:
    """A15: domain x hour distinct-user pivot (webAccessLogParser.sh:916-934,1241-1270).

    Two-step distinct-then-count: a pivot of 24 countDistinct aggregates
    would compile to an Expand that multiplies every input row 24x before
    the hash aggregate; deduping (domain, hour, uid) first keeps the heavy
    pass at 1x and pivots only the tiny deduped set."""
    pairs = access.select("domain", "hour", "uid").distinct()
    return (
        pairs.groupBy("domain")
        .pivot("hour", list(range(24)))
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .orderBy("domain")
    )


# Session boundary predicates (webAccessLogParser.sh:715-719): the reference
# requires EXACT uriPath equality for login, and exact Portal-path equality
# AND a logout=true param for logout — a logout=true on any other URL must
# NOT close a session. Paths here are this repo's datagen vocabulary;
# override per deployment via the keyword args on the operators below.
SESSION_LOGIN_URI = "/secMgmt/roleSelect/loginRoleSelect.xhtml"
SESSION_LOGOUT_URI = "/secMgmt/Portal"


def _session_marks(login_uri: str, logout_uri: str):
    login = F.col("uri_path") == login_uri
    logout = (F.col("uri_path") == logout_uri) & F.col("params").rlike(
        "logout=true")
    return login, logout


def sessionization(
    access: DataFrame,
    login_uri: str = SESSION_LOGIN_URI,
    logout_uri: str = SESSION_LOGOUT_URI,
) -> DataFrame:
    """J5: login/logout pairing per (clone_id, jsession, uid): duration or open
    (webAccessLogParser.sh:715-720,1273-1295).

    Spark-first: one hash aggregate with conditional min/max — no as-of join
    needed because the key is exact.
    """
    login, logout = _session_marks(login_uri, logout_uri)
    ts = F.to_timestamp(F.col("ts_raw"), P.ACCESS_TS_FMT)
    return (
        access.filter(F.col("jsession") != "-")
        .filter(login | logout)
        .groupBy("clone_id", "jsession", "uid")
        .agg(
            F.min(F.when(login, ts)).alias("login_ts"),
            F.max(F.when(logout, ts)).alias("logout_ts"),
        )
        .withColumn(
            "duration_s",
            F.when(
                F.col("login_ts").isNotNull() & F.col("logout_ts").isNotNull()
                & (F.col("logout_ts") >= F.col("login_ts")),
                F.col("logout_ts").cast("long") - F.col("login_ts").cast("long"),
            ),
        )
        .orderBy("clone_id", "jsession", "uid")
    )


# ---------------------------------------------------------------- WAS (A16-A19)

def was_event_counts(was: DataFrame, dim: str) -> DataFrame:
    """A16: counts by (dim, evt) for dim in source/component/wclass/exception/
    msg_code (websphereLogParser.sh:261-271,345-414)."""
    return (
        was.filter(F.col(dim) != "")
        .groupBy(dim, "evt")
        .agg(F.count("*").alias("cnt"))
        .orderBy(dim, "evt")
    )


def hung_thread_summary(was: DataFrame) -> DataFrame:
    """A17: per-JVM hung-thread stats — nhtc (new hung count), mhtc (max
    concurrent), rhtc (remaining at last event) (websphereLogParser.sh:443-532).

    rhtc = chtc of the time-ordered last hung/release event — a max_by over
    (date, numeric-seconds, doc_id) rather than the reference's file-order
    last-row scan.  WAS `time` has an UNPADDED hour ("9:00:00" > "10:00:00"
    lexicographically), so the ordering key must be numeric, exactly as
    txn_timeout_pairs below builds it.
    """
    h = was.filter(F.col("msg_code").isin("WSVR0605W", "WSVR0606W"))
    secs = (
        F.col("hour") * 3600
        + F.split("time", ":").getItem(1).cast("int") * 60
        + F.split("time", ":").getItem(2).cast("int")
    )
    ts_key = F.struct(F.col("event_date"), secs.alias("secs"), F.col("doc_id"))
    return (
        h.groupBy(F.col("source").alias("jvm"))
        .agg(
            F.sum(F.when(F.col("msg_code") == "WSVR0605W", 1).otherwise(0)).alias("nhtc"),
            F.max("chtc").alias("mhtc"),
            F.max_by("chtc", ts_key).alias("rhtc"),
        )
        .orderBy("jvm")
    )


def tto_summary(was: DataFrame) -> DataFrame:
    """A18 (txn timeouts): per-JVM count + avg timeout (websphereLogParser.sh:416-427)."""
    return (
        was.filter(F.col("msg_code") == "WTRN0006W")
        .groupBy(F.col("source").alias("jvm"))
        .agg(F.count("*").alias("tto_cnt"), F.round(F.avg("timeout_s"), 2).alias("avg_timeout_s"))
        .orderBy("jvm")
    )


def starvation_summary(was: DataFrame) -> DataFrame:
    """A18 (CPU starvation): per-JVM count + total delay (websphereLogParser.sh:562-578)."""
    return (
        was.filter(F.col("msg_code") == "HMGR0152W")
        .groupBy(F.col("source").alias("jvm"))
        .agg(F.count("*").alias("starv_cnt"), F.sum("delay_s").alias("sum_delay_s"))
        .orderBy("jvm")
    )


def txn_timeout_pairs(was: DataFrame) -> DataFrame:
    """J4: stateful WTRN0006W/WTRN0124I pairing (websphereLogParser.sh:236-247).

    The reference awk overwrites arrTto[server|threadId] = (timeout, txnId)
    at each WTRN0006W in FILE ORDER and prints the stored values — possibly
    empty — when WTRN0124I arrives on the same key. Re-expressed Spark-first
    as an as-of over one window: partition by (source, thread), order by file
    position (doc_id encodes it), take the last non-null timeout at-or-before
    each release. Unmatched releases are KEPT with null fields, matching the
    reference's empty prints. One shuffle over the tiny WTRN subset.
    """
    ev = was.filter(F.col("msg_code").isin("WTRN0006W", "WTRN0124I"))
    w = (
        Window.partitionBy("source", "thread")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    is_tto = F.col("msg_code") == "WTRN0006W"
    return (
        ev.withColumn(
            "p_txn", F.last(F.when(is_tto, F.col("txn_id")), ignorenulls=True).over(w))
        .withColumn(
            "p_to", F.last(F.when(is_tto, F.col("timeout_s")), ignorenulls=True).over(w))
        .filter(F.col("msg_code") == "WTRN0124I")
        .select(
            "source", "thread",
            F.col("p_txn").alias("txn_id"),
            F.col("p_to").alias("timeout_s"),
            "chtc",
        )
        .orderBy("source", "thread", "txn_id")
    )


def was_recycles(was: DataFrame) -> DataFrame:
    """WAS recycle (server-start) events — one history row per event
    (websphereLogParser.sh:70-73,253: 'open for e-business' appends
    date|time|jvm to RecycleHistoryRpt_all.csv in daily mode)."""
    return (
        was.filter(F.col("msg_code") == "WSVR0001I")
        .select("event_date", "time", F.col("source").alias("jvm"))
        .orderBy("event_date", "jvm", "time")
    )


def filtered_error_counts(was: DataFrame, custom_filter: DataFrame) -> DataFrame:
    """F2+A19: custom-keyword filter hits, counted per (source, normalized msg)
    (websphereLogParser.sh:100,118-123,634-647).

    The pattern list joins into ONE alternation broadcast to executors —
    identical to the reference's egrep pipe; msg canonicalization strips
    volatile tokens (ids/digits) like websphereLogParser.sh:636-637.
    """
    pats = [r.pattern for r in custom_filter.select("pattern").collect()]
    alternation = "|".join(f"(?:{p})" for p in pats)
    norm = F.regexp_replace(F.regexp_replace(F.col("msg"), r"\b\d+\b", "#"), r"tid/\S+", "tid/#")
    return (
        was.filter(F.col("msg").rlike(alternation))
        .withColumn("norm_msg", norm)
        .groupBy("source", "norm_msg")
        .agg(F.count("*").alias("cnt"))
        .orderBy("source", "norm_msg")
    )


def oom_counts(was: DataFrame) -> DataFrame:
    """P12: OutOfMemoryError detector counts per JVM (websphereLogParser.sh:273-276)."""
    return (
        was.filter(F.col("is_oom"))
        .groupBy(F.col("source").alias("jvm"))
        .agg(F.count("*").alias("oom_cnt"))
        .orderBy("jvm")
    )


# ---------------------------------------------------------------- error_log (A20-A21, J6)

def weberror_counts_by_server(err: DataFrame) -> DataFrame:
    """A20: error counts by server (webErrorLogParser.sh:319,401-408)."""
    return (
        err.filter(F.col("subtype") == "client_err")
        .groupBy(F.col("source").alias("web_server"))
        .agg(F.count("*").alias("err_cnt"))
        .orderBy("web_server")
    )


def weberror_counts_by_msg(err: DataFrame) -> DataFrame:
    """A20: counts by (level, errmsg) (webErrorLogParser.sh:320)."""
    return (
        err.filter(F.col("subtype") == "client_err")
        .groupBy("level", "errmsg")
        .agg(F.count("*").alias("cnt"))
        .orderBy("level", "errmsg")
    )


def weberror_counts_by_referer(err: DataFrame) -> DataFrame:
    """A20: counts by (referer sans query, errmsg) (webErrorLogParser.sh:321-322)."""
    return (
        err.filter((F.col("subtype") == "client_err") & (F.col("referer") != ""))
        .withColumn("referer_path", F.split(F.col("referer"), r"\?").getItem(0))
        .groupBy("referer_path", "errmsg")
        .agg(F.count("*").alias("cnt"))
        .orderBy("referer_path", "errmsg")
    )


def mpm_max_busy(err: DataFrame) -> DataFrame:
    """A21 argmax: per-server whole row with max bsy (webErrorLogParser.sh:361-373)
    — max_by(struct(*), bsy), no self-join, no window shuffle-sort."""
    mpm = err.filter(F.col("subtype") == "mpm_global")
    return (
        mpm.groupBy(F.col("source").alias("web_server"))
        .agg(
            F.max_by(
                F.struct("event_date", "time", "rdy", "bsy", "rd", "wr", "ka"),
                F.struct(F.col("bsy"), F.col("time")),  # deterministic tiebreak
            ).alias("peak")
        )
        .select("web_server", "peak.*")
        .orderBy("web_server")
    )


def mpm_timeline(err: DataFrame) -> DataFrame:
    """J6: merge global-stats and plugin-busy rows on (server, date, time)
    (webErrorLogParser.sh:171,232,280-288)."""
    g = err.filter(F.col("subtype") == "mpm_global").select(
        "source", "event_date", "time", "rdy", "bsy", "rd", "wr", "ka", "logc", "dns", "cls"
    )
    b = err.filter(F.col("subtype") == "mpm_bsy").select(
        "source", "event_date", "time", "mod1", "mod1_n", "mod2", "mod2_n"
    )
    return g.join(b, ["source", "event_date", "time"], "full_outer").orderBy(
        "source", "event_date", "time"
    )


def http_recycles(err: DataFrame) -> DataFrame:
    """Recycle (restart) events per server (webErrorLogParser.sh:243-253)."""
    return (
        err.filter(F.col("is_recycle"))
        .groupBy(F.col("source").alias("web_server"))
        .agg(F.count("*").alias("recycle_cnt"))
        .orderBy("web_server")
    )


# ---------------------------------------------------------------- GC (A22-A24)

def gc_daily_stats(gc: DataFrame) -> DataFrame:
    """A22: per (jvm, date): counts + total/avg real time per gcType, pivoted to
    the reference's fixed columns (javaGCStatsParser.sh:455-473,511-551)."""
    base = gc.groupBy(F.col("source").alias("jvm"), "event_date").agg(
        F.sum(F.when(F.col("gc_type") == "GC", 1).otherwise(0)).alias("gc_cnt"),
        F.sum(F.when(F.col("gc_type") == "FULLGC", 1).otherwise(0)).alias("fgc_cnt"),
        F.sum(F.when(F.col("gc_type") == "FULLGC_SYS", 1).otherwise(0)).alias("fgc_sys_cnt"),
        F.round(F.sum(F.when(F.col("gc_type") == "GC", F.col("real_s")).otherwise(0.0)), 2).alias("gc_real_s"),
        F.round(F.sum(F.when(F.col("gc_type") != "GC", F.col("real_s")).otherwise(0.0)), 2).alias("fgc_real_s"),
    )
    return (
        base.withColumn(
            "avg_gc_real_s",
            F.when(F.col("gc_cnt") > 0, F.round(F.col("gc_real_s") / F.col("gc_cnt"), 4)).otherwise(0.0),
        )
        .withColumn(
            "avg_fgc_real_s",
            F.when(
                (F.col("fgc_cnt") + F.col("fgc_sys_cnt")) > 0,
                F.round(F.col("fgc_real_s") / (F.col("fgc_cnt") + F.col("fgc_sys_cnt")), 4),
            ).otherwise(0.0),
        )
        .orderBy("jvm", "event_date")
    )


def gc_event_metrics(gc: DataFrame) -> DataFrame:
    """P17: per-event before-after diffs and %-of-total columns
    (javaGCStatsParser.sh:406-445). Missing generations (minor GC has no
    old/perm figures) propagate null, matching the reference's empty
    fields; zero totals guard the percentage like the awk does."""

    def pct(after, total):
        return F.when(
            total.isNotNull() & (total != 0), F.round(after / total * 100.0, 4)
        )

    return gc.select(
        "source", "event_date", "ts_raw", "gc_type",
        (F.col("young_before_kb") - F.col("young_after_kb")).alias("yng_diff_kb"),
        pct(F.col("young_after_kb"), F.col("young_total_kb")).alias("yng_after_pct"),
        (F.col("old_before_kb") - F.col("old_after_kb")).alias("old_diff_kb"),
        pct(F.col("old_after_kb"), F.col("old_total_kb")).alias("old_after_pct"),
        (F.col("perm_before_kb") - F.col("perm_after_kb")).alias("prm_diff_kb"),
        pct(F.col("perm_after_kb"), F.col("perm_total_kb")).alias("prm_after_pct"),
        (F.col("heap_before_kb") - F.col("heap_after_kb")).alias("hp_diff_kb"),
        pct(F.col("heap_after_kb"), F.col("heap_total_kb")).alias("hp_after_pct"),
    )


def gc_last_record(gc: DataFrame) -> DataFrame:
    """A23: last GC event per JVM (javaGCStatsParser.sh:269-279) — max_by on ts."""
    return (
        gc.groupBy(F.col("source").alias("jvm"))
        .agg(
            F.max_by(
                F.struct(
                    "ts_raw", "gc_type", "heap_after_kb", "heap_total_kb",
                    "old_after_kb", "perm_after_kb",
                ),
                F.col("ts_raw"),
            ).alias("last")
        )
        .select("jvm", "last.*")
        .orderBy("jvm")
    )


GC_SCOPES: tuple[tuple[str, str], ...] = (("jvm.App", "jvmapp"), ("jvm.Bat", "jvmbat"))


def gc_threshold_violations(
    gc: DataFrame,
    thresholds: dict[tuple[str, str], float],
    scopes: tuple[tuple[str, str], ...] = GC_SCOPES,
) -> DataFrame:
    """A24: counts of post-FullGC old/perm occupancy above thresholds per JVM
    (javaGCStatsParser.sh:476-510).

    Thresholds are scoped PER JVM PREFIX like the reference's
    ``substr(pName,1,3)`` key (``jvm.<prefix>.fgcOldGenAfTh``): each JVM is
    judged against ITS class's configured value, and — also like the
    reference — an unconfigured (empty) threshold counts no violations at
    all for that class. ``thresholds`` is the tiny driver-side
    (property, scope)->value dict (alerts.thresholds_dict); the scope is
    resolved as a literal CASE column, so the whole thing stays one
    JVM-side hash aggregate — no join, no Python."""
    old_th = F.lit(None).cast("double")
    perm_th = F.lit(None).cast("double")
    for cls, pfx in scopes:
        ot = thresholds.get(("fgcOldGenAfTh", cls))
        pt = thresholds.get(("fgcPGenAfTh", cls))
        pred = F.col("source").startswith(pfx)
        if ot is not None:
            old_th = F.when(pred, F.lit(float(ot))).otherwise(old_th)
        if pt is not None:
            perm_th = F.when(pred, F.lit(float(pt))).otherwise(perm_th)
    fgc = gc.filter(F.col("gc_type") != "GC").withColumn(
        "old_th", old_th).withColumn("perm_th", perm_th)
    return (
        fgc.groupBy(F.col("source").alias("jvm"))
        .agg(
            F.first("old_th").alias("old_gen_th"),
            F.sum(
                F.when(F.col("old_th").isNotNull()
                       & (F.col("old_after_kb") > F.col("old_th")), 1)
                .otherwise(0)
            ).alias("old_gen_viol"),
            F.first("perm_th").alias("perm_gen_th"),
            F.sum(
                F.when(F.col("perm_th").isNotNull()
                       & (F.col("perm_after_kb") > F.col("perm_th")), 1)
                .otherwise(0)
            ).alias("perm_gen_viol"),
        )
        .orderBy("jvm")
    )
