"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from SURVEY.md §2
over the driver testdata tables; ``oracle_sql()`` gives the DuckDB-
equivalent ANSI SQL (same aliases, same rounding) for the hash compare.
Tokenlog-pipeline entries (prefix ``tl_``) run the parse→enrich→route→
aggregate engine on the deterministic synthetic token table (datagen
seed=42) and are rows-only checks — their exactness is covered by the
pytest oracle suite instead (tests/ vs truth.parquet).

Column-name contract: every computed column is aliased identically in
the Spark code and the SQL so the driver's sorted-column value hash
lines up.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
KNN_QUERY_IDS = [1, 2, 3, 4, 5]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _fmt_ts(c):
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss")


# --------------------------------------------------------------------------
# oracle-checked queries over the driver testdata tables
# --------------------------------------------------------------------------

def q_status_counts(spark, sf):
    """A1 count-by-code + pct-of-total (webAccessLogParser.sh:723,1176-1184)."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy()
    return (
        ev.groupBy("event_type").agg(F.count("*").alias("cnt"))
        .withColumn("pct", F.round(F.lit(100.0) * F.col("cnt") / F.sum("cnt").over(w), 2))
    )


def q_pricing_summary(spark, sf):
    """A2/A6 multi-measure hash aggregate (TPC-H Q1 shape)."""
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        )
    )


def q_distinct_users(spark, sf):
    """A3/A4 exact distinct per dimension (arrDlyuUid, webAccessLogParser.sh:687-689)."""
    ev = _t(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("users"),
        F.count("*").alias("cnt"),
    )


def q_hourly_matrix(spark, sf):
    """A5 hourly perf matrix: counts + conditional counts + avg (sh:744-751)."""
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy(F.hour("ts").cast("int").alias("hr"))
        .agg(
            F.count("*").alias("cnt"),
            F.count(F.when(F.col("value") > 50.0, True)).alias("hi_cnt"),
            F.round(F.avg("value"), 2).alias("avg_value"),
        )
    )


def q_global_rollup(spark, sf):
    """A6 daily grand-total rollup (webAccessLogParser.sh:983-999)."""
    li = _t(spark, sf, "lineitem")
    return li.agg(
        F.count("*").alias("row_cnt"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        _fmt_ts(F.min("l_shipdate")).alias("min_ship"),
        _fmt_ts(F.max("l_shipdate")).alias("max_ship"),
    )


def q_user_stats(spark, sf):
    """A7 per-UID stats (webAccessLogParser.sh:758-760,972-981)."""
    ev = _t(spark, sf, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.round(F.avg("value"), 2).alias("avg_value"),
    )


def q_pivot_type_by_hour(spark, sf):
    """A12 fixed-column-list pivot (method × server, sh:794-824)."""
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy(F.hour("ts").cast("int").alias("hr"))
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
    )


def q_pivot_status_by_priority(spark, sf):
    """A13 wide fixed pivot (response-code × server, sh:826-847)."""
    od = _t(spark, sf, "orders")
    statuses = ["F", "O", "P"]
    return (
        od.groupBy("o_orderpriority").pivot("o_orderstatus", statuses)
        .agg(F.count(F.lit(1)))
        .na.fill(0, statuses)
    )


def q_filtered_group(spark, sf):
    """A14 filter→group→count (400+ by URI, sh:669-671,1191-1197)."""
    ev = _t(spark, sf, "events")
    return (
        ev.filter(F.col("value") >= 90.0)
        .groupBy("event_type").agg(F.count("*").alias("cnt"))
    )


def q_hour_pivot_users(spark, sf):
    """A15 dimension × 24-hour pivot of distinct users (sh:916-934)."""
    ev = _t(spark, sf, "events").withColumn("hr24", F.hour("ts").cast("int"))
    hours = [str(h) for h in range(24)]
    return (
        ev.groupBy("event_type")
        .pivot("hr24", hours)
        .agg(F.countDistinct("user_id"))
        .na.fill(0, hours)
    )


def q_argmax_row(spark, sf):
    """A21 argmax whole-row (mpm max-busy, webErrorLogParser.sh:361-373)."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", "event_id", F.round("value", 2).alias("max_value"))
    )


def q_last_per_key(spark, sf):
    """A23 last-record-per-key (last GC per JVM, javaGCStatsParser.sh:269-279)."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", _fmt_ts("ts").alias("last_ts"))
    )


def q_topk_rows(spark, sf):
    """T1 sort-then-limit top-K rows (top-10 slowest, sh:1300-1329)."""
    ev = _t(spark, sf, "events")
    return (
        ev.orderBy(F.desc("value"), F.asc("event_id"))
        .limit(10)
        .select("event_id", "event_type", F.round("value", 2).alias("value_r"))
    )


def q_topk_groups(spark, sf):
    """T2 top-K groups by rounded avg (top URIs by ART, sh:1331-1356)."""
    ev = _t(spark, sf, "events")
    agg = ev.groupBy("user_id").agg(F.round(F.avg("value"), 6).alias("avg_value"))
    return (
        agg.orderBy(F.desc("avg_value"), F.asc("user_id")).limit(10)
        .select("user_id", F.round("avg_value", 2).alias("avg_r"))
    )


def q_broadcast_enrich(spark, sf):
    """J1 broadcast dimension enrich chain (clone map, sh:196-201,440)."""
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(F.count("*").alias("customers"), F.round(F.sum("c_acctbal"), 2).alias("acctbal"))
    )


def q_segment_stats(spark, sf):
    """J2 fact⋈dim + per-group deviation-ready stats (baseline join, sh:1010-1022)."""
    od = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    return (
        od.join(F.broadcast(c), od["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("orders"), F.round(F.avg("o_totalprice"), 2).alias("avg_price"))
    )


def q_revenue_join(spark, sf):
    """Big fact⋈fact shuffle join + agg (the scale-path join)."""
    li = _t(spark, sf, "lineitem")
    od = _t(spark, sf, "orders")
    return (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("cnt"),
        )
    )


def q_event_pairing(spark, sf):
    """J4 stateful key pairing (WTRN0006W⋈WTRN0124I, websphereLogParser.sh:236-247)."""
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("signup_ts"),
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("purchase_ts"),
        )
        .select(
            "user_id",
            _fmt_ts("signup_ts").alias("signup_s"),
            _fmt_ts("purchase_ts").alias("purchase_s"),
            (F.unix_timestamp("purchase_ts") - F.unix_timestamp("signup_ts")).alias("gap_s"),
        )
    )


def q_sessionization(spark, sf):
    """J5 session start/end pairing → duration (sh:715-720,1273-1295)."""
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            "user_id", "n_events",
            _fmt_ts("first_ts").alias("first_s"),
            _fmt_ts("last_ts").alias("last_s"),
            (F.unix_timestamp("last_ts") - F.unix_timestamp("first_ts")).alias("span_s"),
        )
    )


def q_anti_join(spark, sf):
    """F3 discard/unmatched semantics as left_anti (sh:680-683)."""
    c = _t(spark, sf, "customer")
    od = _t(spark, sf, "orders")
    n = _t(spark, sf, "nation")
    no_orders = c.join(od, c["c_custkey"] == od["o_custkey"], "left_anti")
    return (
        no_orders.join(F.broadcast(n), no_orders["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name").agg(F.count("*").alias("idle_customers"))
    )


def q_rollup_sets(spark, sf):
    """A6 grouping-sets rollup (daily + per-dim granularities in one pass)."""
    li = _t(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


def q_union_all(spark, sf):
    """S2/§2.7 UNION ALL of per-stream counts."""
    ev = _t(spark, sf, "events")
    od = _t(spark, sf, "orders")
    a = ev.groupBy(F.col("event_type").alias("dim")).agg(F.count("*").alias("cnt")) \
        .withColumn("src", F.lit("events"))
    b = od.groupBy(F.col("o_orderstatus").alias("dim")).agg(F.count("*").alias("cnt")) \
        .withColumn("src", F.lit("orders"))
    return a.unionByName(b)


def q_running_window(spark, sf):
    """A17 time-ordered running aggregate (running max chtc, wsLP.sh:479-487)."""
    ev = _t(spark, sf, "events")
    hourly = ev.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hr")
    ).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("hr") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return hourly.select(
        "event_type", "hr", "cnt", F.sum("cnt").over(w).cast("long").alias("running_cnt")
    )


def q_regex_extract(spark, sf):
    """P1-P6 regex field extraction (JVM-side) over the props payload."""
    ev = _t(spark, sf, "events")
    return (
        ev.withColumn("k", F.regexp_extract("props", r"(\d+)", 1).cast("int"))
        .groupBy("event_type")
        .agg(F.round(F.avg("k"), 2).alias("avg_k"), F.max("k").alias("max_k"))
    )


def q_bucketize(spark, sf):
    """P8 range bucketing via when-chain (response-time buckets, sh:465-481)."""
    ev = _t(spark, sf, "events")
    bucket = (
        F.when(F.col("value") <= 20, "<=20")
        .when(F.col("value") <= 50, "<=50")
        .when(F.col("value") <= 80, "<=80")
        .otherwise(">80")
    )
    return ev.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("cnt"))


def q_stats_moments(spark, sf):
    """Statistical aggregates: stddev/variance/correlation per group."""
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_pq"),
        F.count("*").alias("cnt"),
    )


def q_median_price(spark, sf):
    """Exact interpolated percentiles (T-digest-free, parity with SQL)."""
    od = _t(spark, sf, "orders")
    return od.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
    )


def q_point_lookup(spark, sf):
    """whereuid-style selection: all rows for one key, projected + ordered
    (webAccessLogParser.sh:168,1293 T10)."""
    ev = _t(spark, sf, "events")
    return (
        ev.filter(F.col("user_id") == 7)
        .select("event_id", "event_type", _fmt_ts("ts").alias("ts_s"),
                F.round("value", 2).alias("value_r"))
    )


# ---------------------------------------------------------- training-data ops

def q_dedup_exact(spark, sf):
    """Exact dedup groups (operators/dedup.exact_dedup)."""
    from log_parser_spark.operators.dedup import exact_dedup

    return exact_dedup(_t(spark, sf, "documents"))


def q_dedup_rate(spark, sf):
    """Corpus-level duplication stats."""
    d = _t(spark, sf, "documents")
    return d.agg(
        F.count("*").alias("total"),
        F.countDistinct("text").alias("distinct_texts"),
        (F.count("*") - F.countDistinct("text")).alias("dup_rows"),
    )


def q_token_stats(spark, sf):
    """Token counting: whitespace + BPE-ish regex (operators/textstats)."""
    from log_parser_spark.operators.textstats import token_stats

    return token_stats(_t(spark, sf, "documents"))


def q_quality_score(spark, sf):
    """Quality scoring heuristic (operators/textstats.quality_score)."""
    from log_parser_spark.operators.textstats import quality_score

    return quality_score(_t(spark, sf, "documents"))


def q_lang_id(spark, sf):
    """Language-ID heuristic, aggregated (operators/textstats.lang_id)."""
    from log_parser_spark.operators.textstats import lang_id

    return lang_id(_t(spark, sf, "documents")).groupBy("lang_pred").agg(
        F.count("*").alias("cnt")
    )


def q_lang_breakdown(spark, sf):
    d = _t(spark, sf, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("cnt"), F.round(F.avg("n_chars"), 2).alias("avg_chars")
    )


def q_knn_brute(spark, sf):
    """Brute-force cosine top-k (operators/similarity.brute_force_knn)."""
    from log_parser_spark.operators.similarity import brute_force_knn

    return brute_force_knn(_t(spark, sf, "embeddings"), KNN_QUERY_IDS, k=5)


def q_embedding_label_stats(spark, sf):
    e = _t(spark, sf, "embeddings")
    return e.groupBy("label").agg(
        F.count("*").alias("cnt"),
        F.round(F.avg(F.element_at(F.col("embedding").cast("array<double>"), 1)), 6).alias("avg_x0"),
    )


# ------------------------------------------------- rows-only (non-SQL) checks

def _tokenlog(spark):
    """Deterministic synthetic token table (datagen seed=42, sf=0.001)."""
    from log_parser_spark import datagen
    from log_parser_spark.operators.parse import classify, with_line
    from log_parser_spark.sources.token_table import read_token_sequences

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    d = datagen.ensure_dataset(0.001)
    return classify(with_line(read_token_sequences(spark, d))), d


def tl_sink_counts(spark, sf):
    """Route fan-out counts per category sink (S7; north-rule sinks)."""
    classified, _ = _tokenlog(spark)
    return classified.groupBy("category").agg(F.count("*").alias("cnt")).orderBy("category")


def tl_status_counts(spark, sf):
    """A1 on detokenized+grokked access family (vectorized Arrow UDF path)."""
    from log_parser_spark.operators import aggregates as A
    from log_parser_spark.operators.parse import parsed_family

    classified, _ = _tokenlog(spark)
    access = parsed_family(classified, "access").filter(F.col("category") == "access")
    return A.status_counts(access)


def tl_hourly_stats(spark, sf):
    """A5 hourly matrix off the parsed access frame."""
    from log_parser_spark.operators import aggregates as A
    from log_parser_spark.operators.parse import parsed_family

    classified, _ = _tokenlog(spark)
    access = parsed_family(classified, "access").filter(F.col("category") == "access")
    return A.hourly_stats(access)


def tl_gc_daily(spark, sf):
    """A22 GC per-JVM-per-date stats off the parsed gc frame."""
    from log_parser_spark.operators import aggregates as A
    from log_parser_spark.operators.parse import parsed_family

    classified, _ = _tokenlog(spark)
    return A.gc_daily_stats(parsed_family(classified, "gc"))


def tl_was_events(spark, sf):
    """A16 WAS event counts by server off the parsed was frame."""
    from log_parser_spark.operators import aggregates as A
    from log_parser_spark.operators.parse import parsed_family

    classified, _ = _tokenlog(spark)
    return A.was_event_counts(parsed_family(classified, "was"), "source")


def tl_uri_baseline_deviation(spark, sf):
    """J2 baseline-ART broadcast join + deviation calc (sh:1010-1022).

    URIs without a baseline keep the left-join miss inside the operator;
    for the value-hash compare the null doubles are projected to a -999999
    sentinel (NaN hashes unreliably across engines)."""
    from log_parser_spark.operators import aggregates as A
    from log_parser_spark.operators.enrich import baseline_deviation
    from log_parser_spark.operators.parse import parsed_family
    from log_parser_spark.sources.token_table import read_lookup

    classified, d = _tokenlog(spark)
    access = parsed_family(classified, "access").filter(F.col("category") == "access")
    out = baseline_deviation(A.uri_stats(access), read_lookup(spark, d, "perf_baseline"))
    return out.na.fill(
        -999999.0, ["baseline_art", "baseline_diff", "baseline_dev_pct"])


def tl_txn_pairs(spark, sf):
    """J4 stateful WTRN0006W⋈WTRN0124I as-of pairing in file order
    (websphereLogParser.sh:236-247). Unmatched releases keep their row (the
    reference prints empty fields); for hashability the nulls are projected
    to ''/-1 sentinels."""
    from log_parser_spark.operators import aggregates as A
    from log_parser_spark.operators.parse import parsed_family

    classified, _ = _tokenlog(spark)
    out = A.txn_timeout_pairs(parsed_family(classified, "was"))
    return out.select(
        "source", "thread",
        F.coalesce("txn_id", F.lit("")).alias("txn_id"),
        F.coalesce("timeout_s", F.lit(-1)).alias("timeout_s"),
        "chtc",
    )


def tl_mpm_peak(spark, sf):
    """A21/J6 argmax whole-row per server over merged mpm stats (webErrorLogParser.sh:361-373)."""
    from log_parser_spark.operators import aggregates as A
    from log_parser_spark.operators.parse import parsed_family

    classified, _ = _tokenlog(spark)
    return A.mpm_max_busy(parsed_family(classified, "weberror"))


def tl_sessionization(spark, sf):
    """J5 login→logout session durations (sh:715-720,1273-1295).

    Timestamps are projected to strings and duration to bigint so the
    DuckDB oracle hash-compares cleanly (same trick as last_per_key)."""
    from log_parser_spark.operators import aggregates as A
    from log_parser_spark.operators.parse import parsed_family

    classified, _ = _tokenlog(spark)
    access = parsed_family(classified, "access").filter(F.col("category") == "access")
    fmt = "yyyy-MM-dd HH:mm:ss"
    return A.sessionization(access).select(
        "clone_id", "jsession", "uid",
        F.date_format("login_ts", fmt).alias("login_s"),
        F.date_format("logout_ts", fmt).alias("logout_s"),
        F.coalesce(F.col("duration_s").cast("long"), F.lit(-1).cast("long")).alias("duration_s"),
    )


def tl_top_slowest(spark, sf):
    """T1 top-10 slowest requests (sh:1300-1329)."""
    from log_parser_spark.operators import topn as TN
    from log_parser_spark.operators.parse import parsed_family

    classified, _ = _tokenlog(spark)
    access = parsed_family(classified, "access").filter(F.col("category") == "access")
    return TN.top_slowest_requests(access)


def tl_alerts(spark, sf):
    """F9→S9 threshold alerts built directly off the report aggregates —
    no sink round-trip, so the driver's harness can hash it cheaply.
    The `message` column is a format_string of scope+observed (driver-parity
    risk on double→string rendering), so the comparable projection is
    (metric, scope, observed, threshold)."""
    from log_parser_spark.operators import aggregates as A
    from log_parser_spark.operators import alerts as AL
    from log_parser_spark.operators.parse import parsed_family
    from log_parser_spark.sources.token_table import read_lookup

    classified, d = _tokenlog(spark)
    access = parsed_family(classified, "access").filter(F.col("category") == "access")
    was = parsed_family(classified, "was")
    err = parsed_family(classified, "weberror")
    gc = parsed_family(classified, "gc")
    th = AL.thresholds_dict(read_lookup(spark, d, "thresholds"))
    alerts = AL.build_alerts(
        th,
        daily=A.daily_rollup(access),
        uri_agg=A.uri_stats(access),
        server_err=A.weberror_counts_by_server(err),
        mpm_peak=A.mpm_max_busy(err),
        tto=A.tto_summary(was),
        starv=A.starvation_summary(was),
        hung=A.hung_thread_summary(was),
        gc_daily=A.gc_daily_stats(gc),
        maxclients=err.filter(F.col("subtype") == "maxclients"),
    )
    return alerts.select("metric", "scope", "observed", "threshold")


def tl_hourly_sessions(spark, sf):
    """A4 hourly distinct sessions (webAccessLogParser.sh:700-701,1047-1058)."""
    from log_parser_spark.operators import aggregates as A
    from log_parser_spark.operators.parse import parsed_family

    classified, _ = _tokenlog(spark)
    access = parsed_family(classified, "access").filter(F.col("category") == "access")
    return A.sessions_per_hour(access)


def tl_domain_daily(spark, sf):
    """A15 daily per-domain uuc+usc (webAccessLogParser.sh:1241-1266)."""
    from log_parser_spark.operators import aggregates as A
    from log_parser_spark.operators.parse import parsed_family

    classified, _ = _tokenlog(spark)
    access = parsed_family(classified, "access").filter(F.col("category") == "access")
    return A.domain_daily_summary(access)


def tl_whereuid(spark, sf):
    """whereuid report (webAccessLogParser.sh:715-720,1273-1295); timestamps
    projected to strings and the nullable diff to a sentinel for hashing."""
    from log_parser_spark.operators import aggregates as A
    from log_parser_spark.operators.parse import parsed_family
    from log_parser_spark.sources.token_table import read_lookup

    classified, d = _tokenlog(spark)
    access = parsed_family(classified, "access").filter(F.col("category") == "access")
    out = A.whereuid_sessions(access, read_lookup(spark, d, "clone_map"))
    fmt = "yyyy-MM-dd HH:mm:ss"
    return out.select(
        "web_server", "was_server", "clone_id", "jsession", "uid",
        F.date_format("start_ts", fmt).alias("start_s"),
        F.date_format("end_ts", fmt).alias("end_s"),
        F.coalesce(F.col("diff_s"), F.lit(-999999).cast("long")).alias("diff_s"),
    )


def tl_was_recycles(spark, sf):
    """WAS recycle history rows (websphereLogParser.sh:70-73,253)."""
    from log_parser_spark.operators import aggregates as A
    from log_parser_spark.operators.parse import parsed_family

    classified, _ = _tokenlog(spark)
    return A.was_recycles(parsed_family(classified, "was"))


def tl_gc_events(spark, sf):
    """P17 per-event GC diffs/pcts (javaGCStatsParser.sh:406-445). ts_raw
    carries random millis the truth does not record, so the comparable
    projection keys on (source, date, type) + the 8 derived metrics; minor
    GCs' missing old/perm figures map to a sentinel for hashing."""
    from log_parser_spark.operators import aggregates as A
    from log_parser_spark.operators.parse import parsed_family

    classified, _ = _tokenlog(spark)
    out = A.gc_event_metrics(parsed_family(classified, "gc"))
    cols = ["yng_diff_kb", "yng_after_pct", "old_diff_kb", "old_after_pct",
            "prm_diff_kb", "prm_after_pct", "hp_diff_kb", "hp_after_pct"]
    return out.select(
        "source", "event_date", "gc_type",
        *[F.coalesce(F.col(c), F.lit(-999999.0)).alias(c) for c in cols],
    )


def tl_gc_violations(spark, sf):
    """A24 per-prefix-scoped post-FullGC old/perm threshold violations
    (javaGCStatsParser.sh:476-510): each JVM judged against ITS class's
    configured threshold; unconfigured classes (jvm.Bat here) count zero.
    Null (unconfigured) thresholds project to a -1.0 sentinel for hashing."""
    from log_parser_spark.operators import aggregates as A
    from log_parser_spark.operators import alerts as AL
    from log_parser_spark.operators.parse import parsed_family
    from log_parser_spark.sources.token_table import read_lookup

    classified, d = _tokenlog(spark)
    th = AL.thresholds_dict(read_lookup(spark, d, "thresholds"))
    out = A.gc_threshold_violations(parsed_family(classified, "gc"), th)
    return out.select(
        "jvm",
        F.coalesce("old_gen_th", F.lit(-1.0)).alias("old_gen_th"),
        "old_gen_viol",
        F.coalesce("perm_gen_th", F.lit(-1.0)).alias("perm_gen_th"),
        "perm_gen_viol",
    )


def tl_discard_counts(spark, sf):
    """Reference keeps DISTINCT `.discarded` and `.unknownua` review files
    (webAccessLogParser.sh:646-653,680-683); this surfaces each sub-count
    separately: unmatched subtypes + unknown-UA access records."""
    from log_parser_spark.operators import aggregates as A
    from log_parser_spark.operators.parse import parsed_family

    classified, _ = _tokenlog(spark)
    access = parsed_family(classified, "access").filter(
        F.col("category") == "access")
    return A.discard_summary(classified, access)


def q_minhash_lsh(spark, sf):
    """MinHash+LSH near-dup pairs (md5-based, SQL-replayed by the oracle)."""
    from log_parser_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_t(spark, sf, "documents"), threshold=0.5)


def q_simhash_pairs(spark, sf):
    """SimHash near-dup pairs (bit-vote; SQL-replayed by the oracle)."""
    from log_parser_spark.operators.dedup import simhash_near_dups

    # expected_docs sizes the pigeonhole-bucket guard: the sf test corpora
    # are < 100k docs, far under the per-bucket hazard bound.
    return simhash_near_dups(
        _t(spark, sf, "documents"), max_hamming=8, expected_docs=100_000)


def q_ngram_jaccard(spark, sf):
    """Word-n-gram Jaccard near-dup pairs via inverted-index candidates."""
    from log_parser_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_t(spark, sf, "documents"), n=3, threshold=0.5)


def q_decontaminate(spark, sf):
    """Benchmark decontamination report (GPT-3/PaLM n-gram containment):
    training docs sharing >=1 word-3-gram with the held-out eval slice
    (docs whose id ends in '7')."""
    from log_parser_spark.operators.dedup import decontaminate

    docs = _t(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id").endswith("7"))
    train = docs.filter(~F.col("doc_id").endswith("7"))
    return decontaminate(train, bench, n=3, mode="report")


def q_ivf_knn(spark, sf):
    """ANN via IVF coarse-quantizer cells (recall-tested vs brute force)."""
    from log_parser_spark.operators.similarity import ivf_knn

    return ivf_knn(_t(spark, sf, "embeddings"), KNN_QUERY_IDS, k=5,
                   n_cells=8, n_probe=4, dim=64)


def q_near_dup_lsh(spark, sf):
    """Embedding near-dup pairs via multi-table LSH (recall-tested)."""
    from log_parser_spark.operators.similarity import near_dup_pairs_lsh

    # driver embeddings are random normals (max pairwise cosine ~0.5), so a
    # production-style 0.9 threshold returns nothing — 0.4 exercises the
    # bucketing+verify path with a non-empty result
    return near_dup_pairs_lsh(_t(spark, sf, "embeddings"), threshold=0.4, dim=64)


def q_dedup_clusters(spark, sf):
    """Near-dup clusters: word-3-gram Jaccard pairs -> connected components
    -> cluster sizes (iterative min-label propagation on Spark; the DuckDB
    oracle replays it as a WITH RECURSIVE transitive closure + min label).
    The edge set is the SQL-replayable ngram_jaccard_pairs so the whole
    query is hash-checkable; the MinHash edge variant stays exercised by
    q_minhash_lsh + pytest."""
    from log_parser_spark.operators.dedup import (
        connected_components, ngram_jaccard_pairs)

    pairs = ngram_jaccard_pairs(_t(spark, sf, "documents"), n=3, threshold=0.5)
    return (
        connected_components(pairs)
        .groupBy("comp").agg(F.count("*").alias("cluster_size"))
        .orderBy("comp")
    )


def q_lsh_knn(spark, sf):
    """ANN via multi-table hyperplane LSH (recall-tested vs brute force)."""
    from log_parser_spark.operators.similarity import lsh_knn

    return lsh_knn(_t(spark, sf, "embeddings"), KNN_QUERY_IDS, k=5, dim=64)


def q_hash_split(spark, sf):
    """Reproducible train/val/test assignment (salted md5 buckets)."""
    from log_parser_spark.operators.sampling import hash_split

    return hash_split(
        _t(spark, sf, "documents"), val_pct=5.0, test_pct=5.0
    ).select("doc_id", "split")


def q_pack_chunks(spark, sf):
    """Pretraining sequence packing: per-doc chunk spans in the per-source
    concatenated token stream (max_len=1024)."""
    from log_parser_spark.operators.sampling import pack_chunks

    return pack_chunks(_t(spark, sf, "documents"), max_len=1024)


# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: detokenize → grok parse → route → status aggregate at sf0.001."""
    return tl_status_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS: the driver records CORRECTNESS rows for the FIRST 50
    # entries only.  The window therefore holds (a) 17 TPC-shape operator
    # analogues with no tl_* twin, (b) ALL 18 tl_* pipeline queries — the
    # flagship SURVEY §2 operators — and (c) ALL 14 LLM-data-pipeline /
    # dataset-assembly ops.  Ten generic analogues whose operator shape is
    # re-verified by a tl_* twin on the tokenlog tables (and which were
    # driver-hash-green in both rounds 1 and 2) sit past the window at the
    # end; they remain runnable and repo-oracle-checked.
    return {
        # -- TPC-shape operator analogues (unique shapes) ------------------
        "pricing_summary": q_pricing_summary,
        "distinct_users": q_distinct_users,
        "user_stats": q_user_stats,
        "pivot_type_by_hour": q_pivot_type_by_hour,
        "pivot_status_by_priority": q_pivot_status_by_priority,
        "filtered_group": q_filtered_group,
        "last_per_key": q_last_per_key,
        "topk_groups": q_topk_groups,
        "broadcast_enrich": q_broadcast_enrich,
        "segment_stats": q_segment_stats,
        "revenue_join": q_revenue_join,
        "anti_join": q_anti_join,
        "rollup_sets": q_rollup_sets,
        "union_all": q_union_all,
        "running_window": q_running_window,
        "stats_moments": q_stats_moments,
        "median_price": q_median_price,
        # -- tokenlog pipeline (SURVEY §2 flagship operators) --------------
        "tl_sink_counts": tl_sink_counts,
        "tl_status_counts": tl_status_counts,
        "tl_hourly_stats": tl_hourly_stats,
        "tl_gc_daily": tl_gc_daily,
        "tl_was_events": tl_was_events,
        "tl_uri_baseline_deviation": tl_uri_baseline_deviation,
        "tl_txn_pairs": tl_txn_pairs,
        "tl_mpm_peak": tl_mpm_peak,
        "tl_sessionization": tl_sessionization,
        "tl_top_slowest": tl_top_slowest,
        "tl_alerts": tl_alerts,
        "tl_hourly_sessions": tl_hourly_sessions,
        "tl_domain_daily": tl_domain_daily,
        "tl_whereuid": tl_whereuid,
        "tl_was_recycles": tl_was_recycles,
        "tl_gc_events": tl_gc_events,
        "tl_gc_violations": tl_gc_violations,
        "tl_discard_counts": tl_discard_counts,
        # -- LLM-data-pipeline operators -----------------------------------
        "dedup_exact": q_dedup_exact,
        "hash_split": q_hash_split,
        "pack_chunks": q_pack_chunks,
        "token_stats": q_token_stats,
        "quality_score": q_quality_score,
        "lang_id": q_lang_id,
        "knn_brute": q_knn_brute,
        "ngram_jaccard": q_ngram_jaccard,
        "decontaminate": q_decontaminate,
        "dedup_clusters": q_dedup_clusters,
        # LSH families: deterministic hash/projection constants, so even
        # these replay as DuckDB SQL (log_parser_spark/oracles.py) — plus
        # recall/property tests in tests/test_datapipe_ops.py
        "minhash_lsh": q_minhash_lsh,
        "simhash_pairs": q_simhash_pairs,
        "lsh_knn": q_lsh_knn,
        "ivf_knn": q_ivf_knn,
        "near_dup_lsh": q_near_dup_lsh,
        # ------------------------------------------------------- window end
        # Past the driver's 50-entry window: generic analogues whose operator
        # shape has a tl_* twin above (status_counts~tl_status_counts,
        # hourly_matrix~tl_hourly_stats, sessionization~tl_sessionization,
        # event_pairing~tl_txn_pairs, argmax_row~tl_mpm_peak,
        # topk_rows~tl_top_slowest, hour_pivot_users~tl_hourly_sessions,
        # regex_extract~every tl_* grok parse, bucketize~tl_hourly_stats
        # range columns, point_lookup~the plan-asserted partition-pruned
        # scans); all ten were driver-hash-green in rounds 1 and 2,
        # and all remain oracle-backed so the repo's own gate
        # (tools/check_oracle.py) still hash-verifies them every run.
        "status_counts": q_status_counts,
        "hourly_matrix": q_hourly_matrix,
        "sessionization": q_sessionization,
        "event_pairing": q_event_pairing,
        "argmax_row": q_argmax_row,
        "topk_rows": q_topk_rows,
        "hour_pivot_users": q_hour_pivot_users,
        "regex_extract": q_regex_extract,
        "bucketize": q_bucketize,
        "point_lookup": q_point_lookup,
    }


def oracle_sql() -> dict[str, str]:
    ev_hr = "CAST(hour(ts) AS INTEGER)"
    # The tl_* oracles read the deterministic tokenlog dataset (datagen
    # seed=42, sf=0.001) that every tl_* Spark query uses. Materialize it
    # here so the DuckDB side works even if it runs before the Spark side.
    from log_parser_spark import datagen, oracles

    ds = str(datagen.ensure_dataset(0.001))
    truth = f"read_parquet('{ds}/truth.parquet/*.parquet')"  # chunked dir
    baseline = f"read_parquet('{ds}/lookups/perf_baseline.parquet')"
    thresholds = f"read_parquet('{ds}/lookups/thresholds.parquet')"
    # access rows as routed+parsed: family detect hit AND not discarded/broken
    acc = f"SELECT * FROM {truth} WHERE family = 'access' AND category = 'access'"
    # F4 static-content exclusion (webAccessLogParser.sh:742)
    xcl = (
        "(a_status = 304"
        " OR regexp_matches(a_ext, '^(jpg|gif|png|ico|js|css|woff|swf|jar|htm|html|txt)$')"
        " OR regexp_matches(a_uri_path, '(\\.css\\.xhtml$|\\.js\\.xhtml$|\\.png\\.xhtml$|\\.gif\\.xhtml$)')"
        " OR regexp_matches(a_params, 'WilyCmd=cmdMetrics'))"
    )
    # P8 response-time bucket counts r1..r5 (inclusive upper bounds)
    def rngs(col: str, guard: str = "TRUE") -> str:
        bounds = ["{c} <= 1.0", "{c} > 1.0 AND {c} <= 5.0", "{c} > 5.0 AND {c} <= 10.0",
                  "{c} > 10.0 AND {c} <= 20.0", "{c} > 20.0"]
        return ", ".join(
            f"CAST(SUM(CASE WHEN {guard} AND {b.format(c=col)} THEN 1 ELSE 0 END) AS BIGINT) AS r{i+1}_cnt"
            for i, b in enumerate(bounds)
        )

    # epoch seconds of an access event in UTC (raw stamps carry -0400)
    acc_epoch = "(CAST(floor(epoch(strptime(event_date, '%Y-%m-%d'))) AS BIGINT) + secs + 14400)"
    return {
        "status_counts": """
            SELECT event_type, COUNT(*) AS cnt,
                   ROUND(100.0 * COUNT(*) / SUM(COUNT(*)) OVER (), 2) AS pct
            FROM events GROUP BY event_type
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
                   ROUND(MIN(l_extendedprice), 2) AS min_price,
                   ROUND(MAX(l_extendedprice), 2) AS max_price
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "distinct_users": """
            SELECT event_type, COUNT(DISTINCT user_id) AS users, COUNT(*) AS cnt
            FROM events GROUP BY event_type
        """,
        "hourly_matrix": f"""
            SELECT {ev_hr} AS hr, COUNT(*) AS cnt,
                   COUNT(*) FILTER (WHERE value > 50.0) AS hi_cnt,
                   ROUND(AVG(value), 2) AS avg_value
            FROM events GROUP BY 1
        """,
        "user_stats": """
            SELECT user_id, COUNT(*) AS cnt, ROUND(SUM(value), 2) AS sum_value,
                   ROUND(AVG(value), 2) AS avg_value
            FROM events GROUP BY user_id
        """,
        "pivot_type_by_hour": f"""
            SELECT {ev_hr} AS hr,
                   COUNT(*) FILTER (WHERE event_type = 'click') AS click,
                   COUNT(*) FILTER (WHERE event_type = 'error') AS error,
                   COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
                   COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
                   COUNT(*) FILTER (WHERE event_type = 'view') AS view
            FROM events GROUP BY 1
        """,
        "pivot_status_by_priority": """
            SELECT o_orderpriority,
                   COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
                   COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
                   COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
            FROM orders GROUP BY o_orderpriority
        """,
        "filtered_group": """
            SELECT event_type, COUNT(*) AS cnt FROM events
            WHERE value >= 90.0 GROUP BY event_type
        """,
        "hour_pivot_users": (
            "SELECT event_type, "
            + ", ".join(
                f"COUNT(DISTINCT user_id) FILTER (WHERE CAST(hour(ts) AS INTEGER) = {h}) AS \"{h}\""
                for h in range(24)
            )
            + " FROM events GROUP BY event_type"
        ),
        "argmax_row": """
            SELECT event_type, event_id, ROUND(value, 2) AS max_value
            FROM events
            QUALIFY row_number() OVER (PARTITION BY event_type
                                       ORDER BY value DESC, event_id ASC) = 1
        """,
        "last_per_key": """
            SELECT user_id, event_id, event_type,
                   strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
            FROM events
            QUALIFY row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) = 1
        """,
        "topk_rows": """
            SELECT event_id, event_type, ROUND(value, 2) AS value_r
            FROM events ORDER BY value DESC, event_id ASC LIMIT 10
        """,
        "topk_groups": """
            SELECT user_id, ROUND(avg_value, 2) AS avg_r FROM (
                SELECT user_id, ROUND(AVG(value), 6) AS avg_value
                FROM events GROUP BY user_id
            ) ORDER BY avg_value DESC, user_id ASC LIMIT 10
        """,
        "broadcast_enrich": """
            SELECT r_name, COUNT(*) AS customers, ROUND(SUM(c_acctbal), 2) AS acctbal
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r_name
        """,
        "segment_stats": """
            SELECT c_mktsegment, COUNT(*) AS orders,
                   ROUND(AVG(o_totalprice), 2) AS avg_price
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c_mktsegment
        """,
        "revenue_join": """
            SELECT o_orderpriority,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   COUNT(*) AS cnt
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY o_orderpriority
        """,
        "event_pairing": """
            SELECT user_id,
                   strftime(signup_ts, '%Y-%m-%d %H:%M:%S') AS signup_s,
                   strftime(purchase_ts, '%Y-%m-%d %H:%M:%S') AS purchase_s,
                   CAST(floor(epoch(purchase_ts)) - floor(epoch(signup_ts)) AS BIGINT) AS gap_s
            FROM (
                SELECT user_id,
                       MIN(ts) FILTER (WHERE event_type = 'signup') AS signup_ts,
                       MIN(ts) FILTER (WHERE event_type = 'purchase') AS purchase_ts
                FROM events GROUP BY user_id
            )
        """,
        "sessionization": """
            SELECT user_id, COUNT(*) AS n_events,
                   strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_s,
                   strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_s,
                   CAST(floor(epoch(MAX(ts))) - floor(epoch(MIN(ts))) AS BIGINT) AS span_s
            FROM events GROUP BY user_id
        """,
        "anti_join": """
            SELECT n_name, COUNT(*) AS idle_customers
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
            GROUP BY n_name
        """,
        "rollup_sets": """
            SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
                   ROUND(SUM(l_quantity), 2) AS sum_qty
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "union_all": """
            SELECT event_type AS dim, COUNT(*) AS cnt, 'events' AS src
            FROM events GROUP BY event_type
            UNION ALL
            SELECT o_orderstatus AS dim, COUNT(*) AS cnt, 'orders' AS src
            FROM orders GROUP BY o_orderstatus
        """,
        "running_window": f"""
            SELECT event_type, hr, cnt,
                   CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY hr
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                       AS running_cnt
            FROM (
                SELECT event_type, {ev_hr} AS hr, COUNT(*) AS cnt
                FROM events GROUP BY 1, 2
            )
        """,
        "regex_extract": r"""
            SELECT event_type, ROUND(AVG(k), 2) AS avg_k, MAX(k) AS max_k
            FROM (
                SELECT event_type,
                       CAST(regexp_extract(props, '(\d+)', 1) AS INTEGER) AS k
                FROM events
            ) GROUP BY event_type
        """,
        "bucketize": """
            SELECT CASE WHEN value <= 20 THEN '<=20'
                        WHEN value <= 50 THEN '<=50'
                        WHEN value <= 80 THEN '<=80'
                        ELSE '>80' END AS bucket,
                   COUNT(*) AS cnt
            FROM events GROUP BY 1
        """,
        "stats_moments": """
            SELECT l_returnflag,
                   ROUND(stddev_samp(l_extendedprice), 4) AS sd_price,
                   ROUND(var_samp(l_quantity), 4) AS var_qty,
                   ROUND(corr(l_extendedprice, l_quantity), 6) AS corr_pq,
                   COUNT(*) AS cnt
            FROM lineitem GROUP BY l_returnflag
        """,
        "median_price": """
            SELECT o_orderpriority,
                   ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
                   ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90
            FROM orders GROUP BY o_orderpriority
        """,
        "point_lookup": """
            SELECT event_id, event_type,
                   strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
                   ROUND(value, 2) AS value_r
            FROM events WHERE user_id = 7
        """,
        "dedup_exact": """
            SELECT MIN(doc_id) AS keeper, COUNT(*) AS n_dups
            FROM documents GROUP BY text
        """,
        "token_stats": r"""
            SELECT doc_id,
                   CAST(len(string_split_regex(text, '\s+')) AS INTEGER) AS n_words,
                   CAST(len(regexp_extract_all(text,
                        '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INTEGER) AS n_bpeish,
                   CAST(length(text) AS INTEGER) AS n_chars_calc
            FROM documents
        """,
        "quality_score": r"""
            SELECT doc_id, CAST(n_words AS INTEGER) AS n_words,
                   ROUND(stop_hits * 1.0 / n_words, 6) AS stop_ratio,
                   ROUND(n_punct * 1.0 / n_chars, 6) AS punct_ratio,
                   ROUND(
                       LEAST(n_words / 100.0, 1.0) * 0.4
                       + LEAST(stop_hits * 1.0 / n_words * 5.0, 1.0) * 0.3
                       + (1.0 - LEAST(n_punct * 1.0 / n_chars * 10.0, 1.0)) * 0.2
                       + CASE WHEN n_nospace * 1.0 / n_words >= 3
                                   AND n_nospace * 1.0 / n_words <= 10
                              THEN 0.1 ELSE 0.0 END,
                   6) AS quality
            FROM (
                SELECT doc_id,
                       len(string_split_regex(text, '\s+')) AS n_words,
                       len(list_filter(string_split_regex(text, '\s+'),
                           w -> w IN ('the','a','of','and','to','in','is','it','for','on')))
                           AS stop_hits,
                       length(regexp_replace(text, '[^\.,;:!?]', '', 'g')) AS n_punct,
                       length(regexp_replace(text, '\s+', '', 'g')) AS n_nospace,
                       length(text) AS n_chars
                FROM documents
            )
        """,
        "lang_id": r"""
            SELECT lang_pred, COUNT(*) AS cnt FROM (
                SELECT CASE WHEN len(list_filter(string_split_regex(lower(text), '\s+'),
                            w -> w IN ('the','a','of','and','to','in','is','it','for','on')))
                            * 1.0 / len(string_split_regex(lower(text), '\s+')) >= 0.05
                       THEN 'en' ELSE 'unknown' END AS lang_pred
                FROM documents
            ) GROUP BY lang_pred
        """,
        "knn_brute": f"""
            SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                   CAST(row_number() OVER (
                        PARTITION BY q.vec_id
                        ORDER BY list_cosine_similarity(
                            CAST(e.embedding AS DOUBLE[]),
                            CAST(q.embedding AS DOUBLE[])) DESC,
                        e.vec_id ASC) AS INTEGER) AS rank
            FROM embeddings e, embeddings q
            WHERE q.vec_id IN ({", ".join(str(i) for i in KNN_QUERY_IDS)})
              AND e.vec_id <> q.vec_id
            QUALIFY rank <= 5
        """,
        # Word-3-gram Jaccard pairs: DuckDB list ops replay Spark's
        # word_ngrams (1-based inclusive slice == F.slice; k<n -> one
        # short gram) and the uncapped inverted-index count IS the exact
        # intersection size.
        "ngram_jaccard": r"""
            WITH w AS (SELECT doc_id, string_split_regex(text, '\s+') AS ws
                       FROM documents),
            g AS (SELECT doc_id,
                         list_distinct(list_transform(
                             range(1, greatest(len(ws) - 2, 1) + 1),
                             i -> array_to_string(ws[i:i+2], ' '))) AS grams
                  FROM w),
            e AS (SELECT doc_id, len(grams) AS ng, unnest(grams) AS gr FROM g),
            c AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                         a.ng AS na, b.ng AS nb, COUNT(*) AS common
                  FROM e a JOIN e b ON a.gr = b.gr AND a.doc_id < b.doc_id
                  GROUP BY 1, 2, 3, 4)
            SELECT id_a, id_b,
                   ROUND(common / (na + nb - common), 6) AS jaccard
            FROM c WHERE ROUND(common / (na + nb - common), 6) >= 0.5
            ORDER BY id_a, id_b
        """,
        # Decontamination: same word-3-gram builder; containment vs the
        # '%7' eval slice replayed as a distinct-gram semi-join.
        "decontaminate": r"""
            WITH bw AS (SELECT string_split_regex(text, '\s+') AS ws
                        FROM documents WHERE CAST(doc_id AS VARCHAR) LIKE '%7'),
            bg AS (SELECT DISTINCT unnest(list_distinct(list_transform(
                       range(1, greatest(len(ws) - 2, 1) + 1),
                       i -> array_to_string(ws[i:i+2], ' ')))) AS g
                   FROM bw),
            tw AS (SELECT doc_id, string_split_regex(text, '\s+') AS ws
                   FROM documents WHERE CAST(doc_id AS VARCHAR) NOT LIKE '%7'),
            tg AS (SELECT doc_id, unnest(list_distinct(list_transform(
                       range(1, greatest(len(ws) - 2, 1) + 1),
                       i -> array_to_string(ws[i:i+2], ' ')))) AS g
                   FROM tw)
            SELECT tg.doc_id,
                   CAST(COUNT(DISTINCT tg.g) AS BIGINT) AS contaminated_grams
            FROM tg JOIN bg ON tg.g = bg.g
            GROUP BY tg.doc_id ORDER BY tg.doc_id
        """,
        # Connected components over the same pair graph: WITH RECURSIVE
        # transitive closure + min reachable label == Spark's iterative
        # min-label propagation.
        "dedup_clusters": r"""
            WITH RECURSIVE
            w AS (SELECT doc_id, string_split_regex(text, '\s+') AS ws
                  FROM documents),
            g AS (SELECT doc_id,
                         list_distinct(list_transform(
                             range(1, greatest(len(ws) - 2, 1) + 1),
                             i -> array_to_string(ws[i:i+2], ' '))) AS grams
                  FROM w),
            e AS (SELECT doc_id, len(grams) AS ng, unnest(grams) AS gr FROM g),
            c AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                         a.ng AS na, b.ng AS nb, COUNT(*) AS common
                  FROM e a JOIN e b ON a.gr = b.gr AND a.doc_id < b.doc_id
                  GROUP BY 1, 2, 3, 4),
            p AS (SELECT id_a, id_b FROM c
                  WHERE ROUND(common / (na + nb - common), 6) >= 0.5),
            edges AS (SELECT id_a AS u, id_b AS v FROM p
                      UNION SELECT id_b, id_a FROM p),
            reach(id, r) AS (
                SELECT u, u FROM edges
                UNION
                SELECT ed.u, re.r FROM edges ed JOIN reach re ON ed.v = re.id)
            SELECT comp, CAST(COUNT(*) AS BIGINT) AS cluster_size
            FROM (SELECT id, MIN(r) AS comp FROM reach GROUP BY id)
            GROUP BY comp ORDER BY comp
        """,
        # ------------------------------------------------------------ tl_*
        # Tokenlog-pipeline oracles over the SAME deterministic dataset's
        # truth.parquet — independent recomputation of what the Spark side
        # derives from the detokenized+grokked token table.
        "tl_sink_counts": f"""
            SELECT category, COUNT(*) AS cnt FROM {truth} GROUP BY category
        """,
        "tl_status_counts": f"""
            SELECT CAST(a_status AS INTEGER) AS status, COUNT(*) AS cnt,
                   ROUND(COUNT(*) / (SUM(COUNT(*)) OVER ()) * 100.0, 2) AS pct
            FROM ({acc}) GROUP BY 1
        """,
        "tl_hourly_stats": f"""
            WITH agg AS (
                SELECT hour, COUNT(*) AS cnt_incl,
                       CAST(SUM(CASE WHEN NOT {xcl} THEN 1 ELSE 0 END) AS BIGINT) AS cnt_xcl,
                       ROUND(SUM(CASE WHEN NOT {xcl} THEN a_rt ELSE 0.0 END), 6) AS sum_rt_xcl,
                       COUNT(DISTINCT a_uid) AS uuc,
                       {rngs('a_rt', 'NOT ' + xcl)}
                FROM ({acc}) GROUP BY hour)
            SELECT CAST(h.hour AS INTEGER) AS hour,
                   COALESCE(cnt_incl, 0) AS cnt_incl,
                   COALESCE(cnt_xcl, 0) AS cnt_xcl,
                   COALESCE(sum_rt_xcl, 0.0) AS sum_rt_xcl,
                   COALESCE(uuc, 0) AS uuc,
                   COALESCE(r1_cnt, 0) AS r1_cnt, COALESCE(r2_cnt, 0) AS r2_cnt,
                   COALESCE(r3_cnt, 0) AS r3_cnt, COALESCE(r4_cnt, 0) AS r4_cnt,
                   COALESCE(r5_cnt, 0) AS r5_cnt,
                   CASE WHEN COALESCE(cnt_xcl, 0) > 0
                        THEN ROUND(sum_rt_xcl / cnt_xcl, 6) ELSE 0.0 END AS art
            FROM generate_series(0, 23) AS h(hour)
            LEFT JOIN agg ON agg.hour = h.hour
        """,
        "tl_gc_daily": f"""
            WITH b AS (
                SELECT source AS jvm, event_date,
                       CAST(SUM(CASE WHEN g_type = 'GC' THEN 1 ELSE 0 END) AS BIGINT) AS gc_cnt,
                       CAST(SUM(CASE WHEN g_type = 'FULLGC' THEN 1 ELSE 0 END) AS BIGINT) AS fgc_cnt,
                       CAST(SUM(CASE WHEN g_type = 'FULLGC_SYS' THEN 1 ELSE 0 END) AS BIGINT) AS fgc_sys_cnt,
                       ROUND(SUM(CASE WHEN g_type = 'GC' THEN g_real ELSE 0.0 END), 2) AS gc_real_s,
                       ROUND(SUM(CASE WHEN g_type <> 'GC' THEN g_real ELSE 0.0 END), 2) AS fgc_real_s
                FROM {truth} WHERE family = 'gc' GROUP BY 1, 2)
            SELECT jvm, event_date, gc_cnt, fgc_cnt, fgc_sys_cnt, gc_real_s, fgc_real_s,
                   CASE WHEN gc_cnt > 0 THEN ROUND(gc_real_s / gc_cnt, 4) ELSE 0.0 END AS avg_gc_real_s,
                   CASE WHEN fgc_cnt + fgc_sys_cnt > 0
                        THEN ROUND(fgc_real_s / (fgc_cnt + fgc_sys_cnt), 4) ELSE 0.0 END AS avg_fgc_real_s
            FROM b
        """,
        "tl_gc_violations": f"""
            WITH th AS (
                SELECT
                    MAX(CASE WHEN property = 'fgcOldGenAfTh' AND target = 'jvm.App' THEN value END) AS app_old,
                    MAX(CASE WHEN property = 'fgcPGenAfTh' AND target = 'jvm.App' THEN value END) AS app_perm,
                    MAX(CASE WHEN property = 'fgcOldGenAfTh' AND target = 'jvm.Bat' THEN value END) AS bat_old,
                    MAX(CASE WHEN property = 'fgcPGenAfTh' AND target = 'jvm.Bat' THEN value END) AS bat_perm
                FROM {thresholds}),
            g AS (
                SELECT source AS jvm,
                       CASE WHEN source LIKE 'jvmapp%' THEN th.app_old
                            WHEN source LIKE 'jvmbat%' THEN th.bat_old END AS old_th,
                       CASE WHEN source LIKE 'jvmapp%' THEN th.app_perm
                            WHEN source LIKE 'jvmbat%' THEN th.bat_perm END AS perm_th,
                       g_old_after_kb, g_perm_after_kb
                FROM {truth}, th WHERE family = 'gc' AND g_type <> 'GC')
            SELECT jvm,
                   COALESCE(MAX(old_th), -1.0) AS old_gen_th,
                   CAST(SUM(CASE WHEN old_th IS NOT NULL AND g_old_after_kb > old_th THEN 1 ELSE 0 END) AS BIGINT) AS old_gen_viol,
                   COALESCE(MAX(perm_th), -1.0) AS perm_gen_th,
                   CAST(SUM(CASE WHEN perm_th IS NOT NULL AND g_perm_after_kb > perm_th THEN 1 ELSE 0 END) AS BIGINT) AS perm_gen_viol
            FROM g GROUP BY jvm
        """,
        "tl_discard_counts": f"""
            SELECT reason, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
                SELECT CASE WHEN family = 'garbage' THEN 'garbage'
                            WHEN a_broken THEN 'parse_miss'
                            WHEN a_browser = 'curl' THEN 'curl'
                            ELSE 'no_uid' END AS reason
                FROM {truth} WHERE category = 'unmatched'
                UNION ALL
                SELECT 'unknownua' AS reason
                FROM {truth}
                WHERE family = 'access' AND category = 'access'
                  AND a_browser = 'Other'
            ) GROUP BY reason ORDER BY reason
        """,
        "tl_was_events": f"""
            SELECT source, w_evt AS evt, COUNT(*) AS cnt
            FROM {truth} WHERE family = 'was' GROUP BY 1, 2
        """,
        "tl_uri_baseline_deviation": f"""
            WITH u AS (
                SELECT a_uri_path AS uri, COUNT(*) AS cnt,
                       ROUND(SUM(a_rt), 6) AS sum_rt, ROUND(AVG(a_rt), 6) AS art,
                       MIN(a_rt) AS min_rt, MAX(a_rt) AS max_rt,
                       {rngs('a_rt')}
                FROM ({acc}) GROUP BY 1)
            SELECT u.uri, u.cnt, u.sum_rt, u.art, u.min_rt, u.max_rt,
                   u.r1_cnt, u.r2_cnt, u.r3_cnt, u.r4_cnt, u.r5_cnt,
                   COALESCE(b.baseline_art, -999999.0) AS baseline_art,
                   COALESCE(ROUND(u.art - b.baseline_art, 6), -999999.0) AS baseline_diff,
                   COALESCE(CASE WHEN b.baseline_art IS NOT NULL AND b.baseline_art <> 0
                        THEN ROUND((u.art - b.baseline_art) / b.baseline_art * 100.0, 2)
                   END, -999999.0) AS baseline_dev_pct
            FROM u LEFT JOIN {baseline} b ON u.uri = b.uri
        """,
        "tl_txn_pairs": f"""
            WITH ev AS (
                SELECT source, w_thread AS thread, w_subtype, doc_id,
                       CASE WHEN w_subtype = 'tto' THEN w_txn_id END AS t_txn,
                       CASE WHEN w_subtype = 'tto' THEN CAST(w_timeout_s AS INTEGER) END AS t_to,
                       CAST(w_chtc AS INTEGER) AS chtc
                FROM {truth} WHERE family = 'was' AND w_subtype IN ('tto', 'tto_rel'))
            SELECT source, thread,
                   COALESCE(last_value(t_txn IGNORE NULLS) OVER w, '') AS txn_id,
                   COALESCE(last_value(t_to IGNORE NULLS) OVER w, -1) AS timeout_s,
                   chtc
            FROM ev
            WINDOW w AS (PARTITION BY source, thread ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            QUALIFY w_subtype = 'tto_rel'
        """,
        "tl_mpm_peak": f"""
            WITH m AS (
                SELECT source, event_date,
                       printf('%02d:%02d:%02d', secs // 3600, (secs % 3600) // 60, secs % 60) AS time,
                       CAST(e_rdy AS INTEGER) AS rdy, CAST(e_bsy AS INTEGER) AS bsy,
                       CAST(e_rd AS INTEGER) AS rd, CAST(e_wr AS INTEGER) AS wr,
                       CAST(e_ka AS INTEGER) AS ka
                FROM {truth} WHERE family = 'weberror' AND e_subtype = 'mpm_global')
            SELECT source AS web_server, event_date, time, rdy, bsy, rd, wr, ka
            FROM m
            QUALIFY row_number() OVER (PARTITION BY source ORDER BY bsy DESC, time DESC) = 1
        """,
        "tl_sessionization": f"""
            WITH s AS (
                SELECT a_clone_id AS clone_id, a_jsession AS jsession, a_uid AS uid,
                       a_is_login AS il, a_is_logout AS ol, {acc_epoch} AS e
                FROM ({acc})
                WHERE a_jsession <> '-' AND (a_is_login OR a_is_logout)),
            g AS (
                SELECT clone_id, jsession, uid,
                       MIN(CASE WHEN il THEN e END) AS le,
                       MAX(CASE WHEN ol THEN e END) AS oe
                FROM s GROUP BY 1, 2, 3)
            SELECT clone_id, jsession, uid,
                   strftime(make_timestamp(le * 1000000), '%Y-%m-%d %H:%M:%S') AS login_s,
                   strftime(make_timestamp(oe * 1000000), '%Y-%m-%d %H:%M:%S') AS logout_s,
                   COALESCE(CASE WHEN le IS NOT NULL AND oe IS NOT NULL AND oe >= le
                        THEN oe - le END, -1) AS duration_s
            FROM g
        """,
        "tl_top_slowest": f"""
            SELECT doc_id, source, a_uri_path AS uri_path, a_uid AS uid,
                   CAST(a_status AS INTEGER) AS status, a_rt AS rt,
                   CAST(hour AS INTEGER) AS hour
            FROM ({acc}) ORDER BY a_rt DESC, doc_id ASC LIMIT 10
        """,
        "tl_alerts": f"""
            WITH th AS (SELECT property, target, MAX(value) AS value
                        FROM {thresholds} GROUP BY 1, 2),
            a AS ({acc}),
            daily AS (
                SELECT CASE WHEN SUM(CASE WHEN NOT {xcl} THEN 1 ELSE 0 END) > 0
                            THEN ROUND(ROUND(SUM(CASE WHEN NOT {xcl} THEN a_rt ELSE 0.0 END), 6)
                                       / SUM(CASE WHEN NOT {xcl} THEN 1 ELSE 0 END), 6)
                            ELSE 0.0 END AS art
                FROM a),
            uri AS (SELECT a_uri_path AS uri, ROUND(AVG(a_rt), 6) AS art FROM a GROUP BY 1),
            err AS (SELECT source, COUNT(*) AS err_cnt FROM {truth}
                    WHERE family = 'weberror' AND e_subtype = 'client_err' GROUP BY 1),
            mpm AS (SELECT source, CAST(e_bsy AS INTEGER) AS bsy,
                           printf('%02d:%02d:%02d', secs // 3600, (secs % 3600) // 60, secs % 60) AS tm
                    FROM {truth} WHERE family = 'weberror' AND e_subtype = 'mpm_global'
                    QUALIFY row_number() OVER (PARTITION BY source ORDER BY e_bsy DESC, tm DESC) = 1),
            was AS (SELECT * FROM {truth} WHERE family = 'was'),
            tto AS (SELECT source AS jvm, COUNT(*) AS tto_cnt FROM was
                    WHERE w_subtype = 'tto' GROUP BY 1),
            starv AS (SELECT source AS jvm, COUNT(*) AS starv_cnt FROM was
                      WHERE w_subtype = 'starv' GROUP BY 1),
            hung AS (SELECT source AS jvm,
                            CAST(SUM(CASE WHEN w_code = 'WSVR0605W' THEN 1 ELSE 0 END) AS BIGINT) AS nhtc
                     FROM was WHERE w_code IN ('WSVR0605W', 'WSVR0606W') GROUP BY 1),
            gcd AS (SELECT source AS jvm, event_date,
                           CAST(SUM(CASE WHEN g_type = 'GC' THEN 1 ELSE 0 END) AS BIGINT) AS gc_cnt,
                           CAST(SUM(CASE WHEN g_type = 'FULLGC' THEN 1 ELSE 0 END) AS BIGINT) AS fgc_cnt
                    FROM {truth} WHERE family = 'gc' GROUP BY 1, 2)
            SELECT 'httpAvgRespTimeTh' AS metric, 'daily' AS scope,
                   CAST(art AS DOUBLE) AS observed,
                   (SELECT value FROM th WHERE property = 'httpAvgRespTimeTh' AND target = 'http') AS threshold
            FROM daily WHERE art > (SELECT value FROM th WHERE property = 'httpAvgRespTimeTh' AND target = 'http')
            UNION ALL
            SELECT 'httpAvgRespTimeByTranTh', uri, CAST(art AS DOUBLE),
                   (SELECT value FROM th WHERE property = 'httpAvgRespTimeByTranTh' AND target = 'http')
            FROM uri WHERE art > (SELECT value FROM th WHERE property = 'httpAvgRespTimeByTranTh' AND target = 'http')
            UNION ALL
            SELECT 'httpErrorCountTh', source, CAST(err_cnt AS DOUBLE),
                   (SELECT value FROM th WHERE property = 'httpErrorCountTh' AND target = 'http.err')
            FROM err WHERE err_cnt > (SELECT value FROM th WHERE property = 'httpErrorCountTh' AND target = 'http.err')
            UNION ALL
            SELECT 'httpMpmStBsyCountTh', source, CAST(bsy AS DOUBLE),
                   (SELECT value FROM th WHERE property = 'httpMpmStBsyCountTh' AND target = 'http.mpmstat')
            FROM mpm WHERE bsy > (SELECT value FROM th WHERE property = 'httpMpmStBsyCountTh' AND target = 'http.mpmstat')
            UNION ALL
            SELECT 'wasTranTmOutCntTh', jvm, CAST(tto_cnt AS DOUBLE),
                   (SELECT value FROM th WHERE property = 'wasTranTmOutCntTh' AND target = 'was.App')
            FROM tto WHERE jvm LIKE 'wasprod%'
              AND tto_cnt > (SELECT value FROM th WHERE property = 'wasTranTmOutCntTh' AND target = 'was.App')
            UNION ALL
            SELECT 'wasTranTmOutCntTh', jvm, CAST(tto_cnt AS DOUBLE),
                   (SELECT value FROM th WHERE property = 'wasTranTmOutCntTh' AND target = 'was.Bat')
            FROM tto WHERE jvm LIKE 'wasbat%'
              AND tto_cnt > (SELECT value FROM th WHERE property = 'wasTranTmOutCntTh' AND target = 'was.Bat')
            UNION ALL
            SELECT 'wasCPUStarvCntTh', jvm, CAST(starv_cnt AS DOUBLE),
                   (SELECT value FROM th WHERE property = 'wasCPUStarvCntTh' AND target = 'was.App')
            FROM starv WHERE jvm LIKE 'wasprod%'
              AND starv_cnt > (SELECT value FROM th WHERE property = 'wasCPUStarvCntTh' AND target = 'was.App')
            UNION ALL
            SELECT 'wasCPUStarvCntTh', jvm, CAST(starv_cnt AS DOUBLE),
                   (SELECT value FROM th WHERE property = 'wasCPUStarvCntTh' AND target = 'was.Bat')
            FROM starv WHERE jvm LIKE 'wasbat%'
              AND starv_cnt > (SELECT value FROM th WHERE property = 'wasCPUStarvCntTh' AND target = 'was.Bat')
            UNION ALL
            SELECT 'wasHungThrdCntTh', jvm, CAST(nhtc AS DOUBLE),
                   (SELECT value FROM th WHERE property = 'wasHungThrdCntTh' AND target = 'was.App')
            FROM hung WHERE jvm LIKE 'wasprod%'
              AND nhtc > (SELECT value FROM th WHERE property = 'wasHungThrdCntTh' AND target = 'was.App')
            UNION ALL
            SELECT 'wasHungThrdCntTh', jvm, CAST(nhtc AS DOUBLE),
                   (SELECT value FROM th WHERE property = 'wasHungThrdCntTh' AND target = 'was.Bat')
            FROM hung WHERE jvm LIKE 'wasbat%'
              AND nhtc > (SELECT value FROM th WHERE property = 'wasHungThrdCntTh' AND target = 'was.Bat')
            UNION ALL
            SELECT 'gcDlyCountTh', jvm, CAST(gc_cnt AS DOUBLE),
                   (SELECT value FROM th WHERE property = 'gcDlyCountTh' AND target = 'jvm.App')
            FROM gcd WHERE jvm LIKE 'jvmapp%'
              AND gc_cnt > (SELECT value FROM th WHERE property = 'gcDlyCountTh' AND target = 'jvm.App')
            UNION ALL
            SELECT 'gcDlyCountTh', jvm, CAST(gc_cnt AS DOUBLE),
                   (SELECT value FROM th WHERE property = 'gcDlyCountTh' AND target = 'jvm.Bat')
            FROM gcd WHERE jvm LIKE 'jvmbat%'
              AND gc_cnt > (SELECT value FROM th WHERE property = 'gcDlyCountTh' AND target = 'jvm.Bat')
            UNION ALL
            SELECT 'fgcDlyCountTh', jvm, CAST(fgc_cnt AS DOUBLE),
                   (SELECT value FROM th WHERE property = 'fgcDlyCountTh' AND target = 'jvm.App')
            FROM gcd WHERE jvm LIKE 'jvmapp%'
              AND fgc_cnt > (SELECT value FROM th WHERE property = 'fgcDlyCountTh' AND target = 'jvm.App')
            UNION ALL
            SELECT 'fgcDlyCountTh', jvm, CAST(fgc_cnt AS DOUBLE),
                   (SELECT value FROM th WHERE property = 'fgcDlyCountTh' AND target = 'jvm.Bat')
            FROM gcd WHERE jvm LIKE 'jvmbat%'
              AND fgc_cnt > (SELECT value FROM th WHERE property = 'fgcDlyCountTh' AND target = 'jvm.Bat')
            UNION ALL
            SELECT 'httpApproachMaxClients', source,
                   CAST(e_mc_cur AS DOUBLE), CAST(e_mc_max AS DOUBLE)
            FROM {truth} WHERE family = 'weberror' AND e_subtype = 'maxclients'
        """,
        "tl_hourly_sessions": f"""
            WITH agg AS (
                SELECT hour, COUNT(DISTINCT a_jsession) AS jsc
                FROM ({acc}) WHERE a_jsession <> '-' GROUP BY hour)
            SELECT CAST(h.hour AS INTEGER) AS hour, COALESCE(jsc, 0) AS jsc
            FROM generate_series(0, 23) AS h(hour)
            LEFT JOIN agg ON agg.hour = h.hour
        """,
        "tl_domain_daily": f"""
            WITH a AS ({acc}),
            u1 AS (SELECT a_domain AS domain, COUNT(DISTINCT a_uid) AS uuc
                   FROM a GROUP BY 1),
            u2 AS (SELECT domain, COUNT(*) AS usc FROM (
                       SELECT DISTINCT a_domain AS domain, a_clone_id, a_jsession
                       FROM a WHERE a_jsession <> '-') GROUP BY 1)
            SELECT u1.domain, u1.uuc, COALESCE(u2.usc, 0) AS usc
            FROM u1 LEFT JOIN u2 ON u1.domain = u2.domain
        """,
        "tl_whereuid": f"""
            WITH cm AS (SELECT clone_id, was_server
                        FROM read_parquet('{ds}/lookups/clone_map.parquet')),
            s AS (
                SELECT t.source AS web_server, cm.was_server,
                       a_clone_id AS clone_id, a_jsession AS jsession,
                       a_uid AS uid, a_is_login, a_is_logout, doc_id,
                       {acc_epoch} AS e
                FROM ({acc}) t LEFT JOIN cm ON t.a_clone_id = cm.clone_id
                WHERE a_jsession <> '-' AND (a_is_login OR a_is_logout)),
            st AS (SELECT web_server, was_server, clone_id, jsession, uid, e
                   FROM s WHERE a_is_login
                   QUALIFY row_number() OVER (
                       PARTITION BY web_server, was_server, clone_id, jsession, uid
                       ORDER BY doc_id DESC) = 1),
            en AS (SELECT web_server, was_server, clone_id, jsession, uid, e
                   FROM s WHERE a_is_logout
                   QUALIFY row_number() OVER (
                       PARTITION BY web_server, was_server, clone_id, jsession, uid
                       ORDER BY doc_id DESC) = 1)
            SELECT st.web_server, st.was_server, st.clone_id, st.jsession, st.uid,
                   strftime(make_timestamp(st.e * 1000000), '%Y-%m-%d %H:%M:%S') AS start_s,
                   strftime(make_timestamp(en.e * 1000000), '%Y-%m-%d %H:%M:%S') AS end_s,
                   COALESCE(en.e - st.e, -999999) AS diff_s
            FROM st LEFT JOIN en USING (web_server, was_server, clone_id, jsession, uid)
        """,
        "tl_was_recycles": f"""
            SELECT event_date,
                   printf('%d:%02d:%02d', secs // 3600, (secs % 3600) // 60, secs % 60) AS time,
                   source AS jvm
            FROM {truth} WHERE family = 'was' AND w_code = 'WSVR0001I'
        """,
        "tl_gc_events": f"""
            WITH g AS (SELECT * FROM {truth} WHERE family = 'gc')
            SELECT source, event_date, g_type AS gc_type,
                   CAST(g_young_before_kb - g_young_after_kb AS DOUBLE) AS yng_diff_kb,
                   CASE WHEN g_young_total_kb <> 0
                        THEN ROUND(g_young_after_kb / g_young_total_kb * 100.0, 4)
                        ELSE -999999.0 END AS yng_after_pct,
                   CASE WHEN g_type <> 'GC'
                        THEN CAST(g_old_before_kb - g_old_after_kb AS DOUBLE)
                        ELSE -999999.0 END AS old_diff_kb,
                   CASE WHEN g_type <> 'GC' AND g_old_total_kb <> 0
                        THEN ROUND(g_old_after_kb / g_old_total_kb * 100.0, 4)
                        ELSE -999999.0 END AS old_after_pct,
                   CASE WHEN g_type <> 'GC'
                        THEN CAST(g_perm_before_kb - g_perm_after_kb AS DOUBLE)
                        ELSE -999999.0 END AS prm_diff_kb,
                   CASE WHEN g_type <> 'GC' AND g_perm_total_kb <> 0
                        THEN ROUND(g_perm_after_kb / g_perm_total_kb * 100.0, 4)
                        ELSE -999999.0 END AS prm_after_pct,
                   CAST(g_heap_before_kb - g_heap_after_kb AS DOUBLE) AS hp_diff_kb,
                   CASE WHEN g_heap_total_kb <> 0
                        THEN ROUND(g_heap_after_kb / g_heap_total_kb * 100.0, 4)
                        ELSE -999999.0 END AS hp_after_pct
            FROM g
        """,
        # -- LSH-family replays (log_parser_spark/oracles.py): the operator
        # hashes/projections are deterministic constants, so the exact pair
        # sets and rankings replay as SQL — md5_number_lower equals the
        # kernels' 64-bit hash, permutations are HUGEINT arithmetic, and
        # hyperplane/centroid floats are inlined as exact %.17e literals
        # with left-associated sums matching F.aggregate's fold.
        "minhash_lsh": oracles.minhash_lsh_sql(threshold=0.5),
        "simhash_pairs": oracles.simhash_pairs_sql(max_hamming=8),
        "lsh_knn": oracles.lsh_knn_sql(KNN_QUERY_IDS, k=5, dim=64),
        "ivf_knn": oracles.ivf_knn_sql(
            KNN_QUERY_IDS, k=5, n_cells=8, n_probe=4, dim=64),
        "near_dup_lsh": oracles.near_dup_lsh_sql(threshold=0.4, dim=64),
        # -- dataset-assembly ops (operators/sampling.py): the split hash
        # is the same md5 low half, so membership replays exactly
        "hash_split": """
            SELECT doc_id,
                   CASE WHEN md5_number_lower(doc_id::VARCHAR || ':v1') % 10000 < 500
                        THEN 'val'
                        WHEN md5_number_lower(doc_id::VARCHAR || ':v1') % 10000 < 1000
                        THEN 'test'
                        ELSE 'train' END AS split
            FROM documents
        """,
        "pack_chunks": """
            WITH n AS (SELECT doc_id, source,
                              CAST(len(string_split_regex(text, '\\s+')) AS BIGINT)
                                  AS n_tok
                       FROM documents),
            o AS (SELECT doc_id, source, n_tok,
                         CAST(COALESCE(SUM(n_tok) OVER (
                             PARTITION BY source ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                             0) AS BIGINT) AS "offset"
                  FROM n)
            SELECT doc_id, source, n_tok, "offset",
                   CAST("offset" // 1024 AS BIGINT) AS chunk_start,
                   CAST(("offset" + n_tok - 1) // 1024 AS BIGINT) AS chunk_end,
                   CAST("offset" % 1024 AS BIGINT) AS offset_in_chunk
            FROM o
        """,
    }
