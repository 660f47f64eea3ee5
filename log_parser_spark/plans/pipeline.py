"""The end-to-end daily pipeline: scan -> parse -> enrich -> route -> sinks ->
aggregates -> alerts/history, with lineage + resumable snapshot commits.

Reference lifecycle being re-expressed (SURVEY.md §3): masterLogParser.sh runs
four AWK parsers sequentially over the day's files; here one Spark DAG scans
the pruned token table once, classifies/routes in a single pass, fans out to
four sinks in ONE partitionBy write, then runs every report off one persisted
parsed frame per family.

Physical-plan intent at cluster scale:
  - scan: partition-pruned parquet/Iceberg read (S1/S4), predicate pushdown
  - detokenize+classify: one Python/Arrow hop, then JVM-only gates
  - route: salted repartition (skew) -> single fan-out write (S7)
  - aggregates: hash aggregates off a persisted parsed frame (shared-scan
    discipline, SURVEY.md §4 'multi-aggregate')
  - every sink commit is an idempotent txid -> crash-resume never duplicates
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datagen import MAIN_DATE
from ..operators import aggregates as A
from ..operators import alerts as AL
from ..operators import topn as TN
from ..operators.enrich import enrich_route_meta
from ..operators.parse import classify, parsed_family, with_line
from ..operators.route import lineage_frame
from ..sources.atomic import AtomicTable
from ..sources.token_table import read_all_lookups, read_token_sequences


@dataclass
class PipelineResult:
    out_dir: Path
    rows_in: int = 0
    sink_counts: dict = field(default_factory=dict)
    reports: dict = field(default_factory=dict)
    elapsed_s: float = 0.0
    committed: list = field(default_factory=list)
    skipped: list = field(default_factory=list)
    phase_s: dict = field(default_factory=dict)


def _bundle_reports(
    reports: dict[str, DataFrame], n_chunks: int = 8,
) -> list[tuple[str, DataFrame, dict[str, str]]]:
    """Bundle the report set into a few (suffix, frame, schemas) chunks of
    (report_name, row_json) unions.

    Why chunks and not one mega-union: the reports phase carries a large
    CORE-COUNT-INDEPENDENT driver cost — Catalyst optimization + whole-stage
    codegen of every report subplan (measured ~17 s at sf0.001 where compute
    is nil). A single union serializes all of that on one driver thread; a
    handful of chunks submitted through the commit pool plan/compile/run
    concurrently, while still collapsing ~41 snapshot commits to n_chunks.
    On a real cluster each chunk is one Iceberg commit."""
    names = sorted(reports)

    def _one(name: str):
        df = reports[name]
        return df.schema.json(), df.select(
            F.lit(name).alias("report_name"),
            F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("row_json"),
        )

    built = {n: _one(n) for n in names}

    chunks: list[tuple[str, DataFrame, dict[str, str]]] = []
    n_chunks = max(1, min(n_chunks, len(names)))
    for i in range(n_chunks):
        chunk_names = names[i::n_chunks]
        if not chunk_names:
            continue
        schemas = {name: built[name][0] for name in chunk_names}
        parts = [built[name][1] for name in chunk_names]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        chunks.append((f"b{i}", out, schemas))
    return chunks


def read_report(
    spark: SparkSession, out_dir: str | Path, name: str, txid: str | None = None,
) -> DataFrame | None:
    """Parse one report back out of the bundled `reports` table."""
    import json as _json

    from pyspark.sql import types as T

    at = AtomicTable(Path(out_dir) / "reports")
    # a run commits its reports as several chunk snapshots {txid}-b{i};
    # `txid` here is the RUN id (recorddate), so prefix-match the chunks
    recs = [
        r for r in at.committed().values()
        if txid is None or r["txid"] == txid or r["txid"].startswith(f"{txid}-b")
    ]
    schema_json = None
    for r in reversed(recs):
        sj = (r.get("report_schemas") or {}).get(name)
        if sj:
            schema_json = sj
            break
    if schema_json is None:
        return None
    # schemas come from the original chunk manifests (kept through
    # maintenance), but DATA must skip snapshots a compaction replaced —
    # except for a txid-scoped read, which is time travel into the
    # pre-compaction chunks (valid until expire_snapshots()).
    live = at._live(recs)
    df = at._read_recs(spark, live if (txid is None or live) else recs)
    if df is None:
        return None
    schema = T.StructType.fromJson(_json.loads(schema_json))
    return (
        df.filter(F.col("report_name") == name)
        .select(F.from_json("row_json", schema).alias("r"))
        .select("r.*")
    )


def _access_reports(
    access: DataFrame, lookups: dict, persisted: list | None = None,
) -> dict:
    from ..operators.enrich import baseline_deviation

    # Shared aggregates: uri/domain/uid/ext stats each feed BOTH a full
    # listing and a top-K (and uri also the alert family). Persist the tiny
    # aggregated frames so the report job aggregates the big access cache
    # once per key, not once per consumer.
    uri = A.uri_stats(access).persist()
    dom = A.domain_stats(access).persist()
    uids = A.uid_stats(access).persist()
    ext = A.ext_stats(access).persist()
    if persisted is not None:
        persisted += [uri, dom, uids, ext]
    return {
        "status_counts": lambda: A.status_counts(access),
        "uri_stats": lambda: baseline_deviation(uri, lookups["perf_baseline"]),
        "hourly_stats": lambda: A.hourly_stats(access),
        "daily_rollup": lambda: A.daily_rollup(access),
        "uid_stats": lambda: uids,
        "domain_stats": lambda: dom,
        "ext_stats": lambda: ext,
        "browser_usage": lambda: A.browser_usage(access),
        "os_usage": lambda: A.os_usage(access),
        "server_stats": lambda: A.server_stats(access),
        "was_server_stats": lambda: A.was_server_stats(access, lookups["clone_map"]),
        "method_by_server": lambda: A.method_by_server(access),
        "status_by_server": lambda: A.status_by_server(access),
        "errors_by_uri": lambda: A.errors_by_uri(access),
        "domain_hour_users": lambda: A.domain_hour_users(access),
        "sessions": lambda: A.sessionization(access),
        "hourly_sessions": lambda: A.sessions_per_hour(access),
        "domain_hour_sessions": lambda: A.domain_hour_sessions(access),
        "domain_daily_summary": lambda: A.domain_daily_summary(access),
        "whereuid": lambda: A.whereuid_sessions(access, lookups["clone_map"]),
        "top_slowest": lambda: TN.top_slowest_requests(access),
        "top_uris_by_art": lambda: uri.orderBy(F.desc("art"), "uri").limit(10),
        "top_error_urls": lambda: TN.top_error_urls(access),
        "top_domains_by_art": lambda: dom.orderBy(F.desc("art"), "domain").limit(5),
        "top_uids_by_art": lambda: uids.orderBy(F.desc("art"), "uid").limit(5),
        "ext_sorted": lambda: ext.orderBy(F.desc("cnt"), "ext"),
    }


def _was_reports(was: DataFrame, lookups: dict) -> dict:
    return {
        "was_events_by_server": lambda: A.was_event_counts(was, "source"),
        "was_events_by_component": lambda: A.was_event_counts(was, "component"),
        "was_events_by_class": lambda: A.was_event_counts(was, "wclass"),
        "was_events_by_exception": lambda: A.was_event_counts(was, "exception"),
        "was_events_by_code": lambda: A.was_event_counts(was, "msg_code"),
        "hung_threads": lambda: A.hung_thread_summary(was),
        "tto": lambda: A.tto_summary(was),
        "starvation": lambda: A.starvation_summary(was),
        "txn_pairs": lambda: A.txn_timeout_pairs(was),
        "filtered_errors": lambda: A.filtered_error_counts(
            was, lookups["custom_filter"]),
        "oom": lambda: A.oom_counts(was),
        "was_top_errors_by_component": lambda: TN.was_top_events(
            was, "component", ["E", "F"]),
        "was_top_warns_by_component": lambda: TN.was_top_events(
            was, "component", ["W"]),
        "was_recycles": lambda: A.was_recycles(was),
    }


def _err_reports(err: DataFrame) -> dict:
    return {
        "weberror_by_server": lambda: A.weberror_counts_by_server(err),
        "weberror_by_msg": lambda: A.weberror_counts_by_msg(err),
        "weberror_by_referer": lambda: A.weberror_counts_by_referer(err),
        "mpm_peak": lambda: A.mpm_max_busy(err),
        "mpm_timeline": lambda: A.mpm_timeline(err),
        "http_recycles": lambda: A.http_recycles(err),
    }


def _gc_reports(gc: DataFrame, th: dict) -> dict:
    return {
        "gc_daily": lambda: A.gc_daily_stats(gc),
        "gc_last": lambda: A.gc_last_record(gc),
        "gc_violations": lambda: A.gc_threshold_violations(gc, th),
    }


def run_pipeline(
    spark: SparkSession,
    dataset_dir: str | Path,
    out_dir: str | Path,
    recorddate: str = MAIN_DATE,
    sources: list[str] | None = None,
    num_partitions: int | None = None,
    stop_after: int | None = None,  # crash-injection hook for resume tests
    rpttype: str = "all",           # usage.sh -t: all|web|was|err|gc
    procoption: str = "daily",      # usage.sh -p: daily|ondemand (history gate)
) -> PipelineResult:
    t0 = time.time()
    out = Path(out_dir)
    res = PipelineResult(out_dir=out)
    if num_partitions is None:
        num_partitions = 0  # direct write (no pre-write shuffle) by default

    tokens = read_token_sequences(spark, dataset_dir, sources)
    lookups = read_all_lookups(spark, dataset_dir)
    th = AL.thresholds_dict(lookups["thresholds"])

    from ..operators.parse import fused_parse
    from ..operators.route import with_scan_provenance

    commits = 0
    import threading

    _lock = threading.Lock()

    def commit(table: str, df: DataFrame, txid: str, partition_by=None, meta=None) -> bool:
        nonlocal commits
        at = AtomicTable(out / table)
        with _lock:
            if at.is_committed(txid):
                res.skipped.append(f"{table}:{txid}")
                return False
            if stop_after is not None and commits >= stop_after:
                raise RuntimeError(f"injected crash before commit {table}:{txid}")
        at.commit(df, txid, partition_by=partition_by, meta=meta)
        with _lock:
            res.committed.append(f"{table}:{txid}")
            commits += 1
        return True

    # ---- parse + route in ONE scan / ONE Arrow pass (S7): detokenize +
    # classify + every family grok, then fan out to the 4 category sinks.
    # Sinks store the byte-string `line` view of the tokens (exact bijection
    # — see retokenize_udf; 1/4 the bytes of the int32 arrays) plus every
    # parsed column, so each report below is a column-pruned, family-pushdown
    # parquet read — the "silver table" discipline: parse once, aggregate
    # many times, never re-cross into Python.
    parsed_full = enrich_route_meta(
        fused_parse(with_scan_provenance(tokens), keep_tokens=False),
        lookups["route_meta"],
    )
    if num_partitions:
        # salted repartition (hot-source skew defusal + file-size control):
        # shuffle on (category, salt) so no writer task owns a hot sink.
        # Off by default locally — scan tasks are size-bounded and already
        # balanced; turn on to control files-per-sink on a real cluster.
        from ..operators.route import salted

        parsed_full = salted(parsed_full, num_partitions, "category")
    commit("sinks", parsed_full, f"{recorddate}-routed", partition_by=["category"])
    res.phase_s["parse_route_sinks"] = round(time.time() - t0, 2)

    def _mark(name: str) -> None:
        # cumulative-subtraction phase clock (sub-phases sum to elapsed)
        res.phase_s[name] = round(time.time() - t0 - sum(res.phase_s.values()), 2)

    # Read back ONLY this run's snapshot (Iceberg snapshot-id scan): the sinks
    # table accumulates one snapshot per daily run, and a rerun into the same
    # out dir must not aggregate over N unioned copies of the corpus.
    sinks_table = AtomicTable(out / "sinks")
    classified = sinks_table.read_txid(spark, f"{recorddate}-routed")

    # ---- lineage (S10 / north rule)
    lineage = lineage_frame(classified).withColumn(
        "snapshot_id", F.lit(f"{recorddate}-routed"))
    commit("lineage", lineage, f"{recorddate}-lineage")
    _mark("lineage")

    # ---- per-family parsed frames off the written sinks: every report is a
    # column-pruned parquet read with a family/date predicate pushed to the
    # scan — no persist needed (the sink files ARE the shared materialization)
    date_gate = F.col("event_date") == recorddate  # F8 summarize-date gate
    # access is ~70% of rows and feeds ~25 reports — cache it ONCE, pruned
    # to exactly the columns the report set reads (the silver table carries
    # wide raw-string columns like ua/uri_full/host that no aggregate
    # touches; keeping them in the cache multiplies the memory traffic of
    # every report pass — the reports phase is memory-bus-bound, so cache
    # bytes are the scaling currency here).
    ACCESS_REPORT_COLS = [
        "doc_id", "source", "ts_raw", "method", "uri_path", "params",
        "domain", "ext", "status", "rt", "jsession", "clone_id", "uid",
        "browser", "os_name", "event_date", "hour", "range",
    ]
    # coalesce the cached frames to a fixed, modest partition count: every
    # report re-reads the cache, so its partition count multiplies into
    # (reports x partitions) task-launch events on the driver's single
    # scheduler loop — with 32 MB input splits the raw scan is ~75
    # partitions and 25 access reports made ~2k task events of pure
    # driver-serial overhead per run. 24/8 keeps all cores busy while
    # capping that constant. (On a real cluster: size cache partitions to
    # executor count, not input splits.)
    access = (
        parsed_family(classified, "access")
        .filter((F.col("category") == "access") & date_gate)
        .select(*ACCESS_REPORT_COLS)
        .coalesce(24)
        .persist()
    )
    # the small families each feed several reports — persist to avoid
    # repeated parquet decode of the same rows (was: 13 reports)
    was = parsed_family(classified, "was").filter(date_gate).coalesce(8).persist()
    err = parsed_family(classified, "weberror").filter(date_gate).coalesce(8).persist()
    gc = parsed_family(classified, "gc").filter(date_gate).coalesce(8).persist()

    from concurrent.futures import ThreadPoolExecutor

    # Kick the four family-cache materializations onto the executors NOW,
    # then construct the ~44 report plans on the driver while the cluster
    # chews: plan construction is ~7 s of driver-serial py4j/Catalyst work
    # at ANY scale (a core-count-independent constant that would otherwise
    # land on both legs of the scaling pair), and the blocking count() calls
    # release the GIL, so it hides completely under the cache-build compute.
    warm_pool: ThreadPoolExecutor | None = None
    warm_futs: list = []
    if stop_after is None:
        warm_pool = ThreadPoolExecutor(max_workers=4)
        warm_futs = [warm_pool.submit(d.count) for d in (access, was, err, gc)]

    persisted: list[DataFrame] = []
    builders: dict = {}
    if rpttype in ("all", "web"):
        builders.update(_access_reports(access, lookups, persisted))
        # No date gate on the unmatched side: garbage/parse-miss rows have no
        # trustworthy event date (the reference counts discards per input
        # file set, sh:680-683), and the snapshot read is already scoped to
        # this run. The unknownua review count rides the date-gated access.
        builders["discard_summary"] = lambda: A.discard_summary(classified, access)
    if rpttype in ("all", "was"):
        builders.update(_was_reports(was, lookups))
    if rpttype in ("all", "err"):
        builders.update(_err_reports(err))
    if rpttype in ("all", "gc"):
        builders.update(_gc_reports(gc, th))
    # Construct the ~44 report plans on a small thread pool instead of a
    # serial loop: each plan is a chain of py4j round-trips (socket waits
    # that release the GIL) plus driver-side Catalyst analysis — a
    # core-count-independent CONSTANT that otherwise serializes into the
    # wall of both scaling legs (and of every executor count on a real
    # cluster). Insertion order is preserved for _bundle_reports chunking.
    _names = list(builders)
    with ThreadPoolExecutor(max_workers=8) as _ppool:
        _frames = list(_ppool.map(lambda n: builders[n](), _names))
    reports: dict[str, DataFrame] = dict(zip(_names, _frames))

    # Commit the reports as a FEW bundled (report_name, row_json) snapshots:
    # chunking parallelizes the core-count-independent driver cost (plan +
    # codegen per report subplan) across the commit pool while still
    # collapsing ~41 per-report commits to n_chunks manifest appends.
    # Per-report frames parse back via read_report() using the schemas
    # stored in the manifests.
    tail: list[tuple[str, DataFrame, list | None, dict | None, str]] = []
    if reports:
        for suffix, bundle, schemas in _bundle_reports(reports):
            tail.append(("reports", bundle, ["report_name"],
                         {"report_schemas": schemas}, f"{recorddate}-{suffix}"))
    # history append (S8): one daily row per history table; gated on daily
    # mode like the reference (usage.sh:111-119, e.g. sh:984-986)
    if procoption == "daily" and rpttype == "all":
        tail += [
            ("history/http_perf",
             reports["daily_rollup"].withColumn("record_date", F.lit(recorddate)),
             None, None, recorddate),
            ("history/gc", reports["gc_daily"], None, None, recorddate),
            ("history/recycles",
             reports["http_recycles"].withColumn("record_date", F.lit(recorddate)),
             None, None, recorddate),
            ("history/was_recycles",
             reports["was_recycles"].withColumn("record_date", F.lit(recorddate)),
             None, None, recorddate),
            ("history/mpm",
             reports["mpm_peak"].withColumn("record_date", F.lit(recorddate)),
             None, None, recorddate),
        ]
    # alerts (F9 -> S9): reuse the already-built report frames
    if rpttype == "all":
        # reused report frames: persist so the concurrent history/alert
        # commits don't each re-aggregate the access cache
        for name in ("daily_rollup", "gc_daily", "http_recycles",
                     "was_recycles", "mpm_peak", "weberror_by_server",
                     "tto", "starvation", "hung_threads"):
            if name in reports:
                persisted.append(reports[name].persist())
        alerts = AL.build_alerts(
            th,
            daily=reports["daily_rollup"],
            uri_agg=reports["uri_stats"],
            server_err=reports["weberror_by_server"],
            mpm_peak=reports["mpm_peak"],
            tto=reports["tto"],
            starv=reports["starvation"],
            hung=reports["hung_threads"],
            gc_daily=reports["gc_daily"],
            maxclients=err.filter(F.col("subtype") == "maxclients"),
        )
        if alerts is not None:
            tail.append(("alerts", alerts, None, None, recorddate))
    _mark("build_frames")

    if stop_after is not None:
        for name, df, pby, meta, txid in tail:
            commit(name, df, txid, partition_by=pby, meta=meta)
    else:
        # WARM the caches before the tail fan-out so every tail job runs on
        # warm blocks (a cold cache is built under per-block locks). The four
        # family counts were kicked off before plan construction — join them.
        for f in warm_futs:
            f.result()
        if warm_pool is not None:
            warm_pool.shutdown()
        if persisted:
            with ThreadPoolExecutor(max_workers=8) as pool:
                list(pool.map(lambda d: d.count(), persisted))
        _mark("warm_caches")

        import os as _os
        # 8 concurrent commits: each is a small executor job plus
        # driver-serial manifest work; 4 workers left the tail
        # driver-bound at high parallelism (31 s of the 180 s local[8]
        # leg at SF=2 — a constant that caps scaling efficiency).
        tail_workers = int(_os.environ.get("PIPELINE_TAIL_WORKERS", "8"))
        with ThreadPoolExecutor(max_workers=tail_workers) as pool:
            futs = [
                pool.submit(commit, name, df, txid, pby, meta)
                for name, df, pby, meta, txid in tail
            ]
            for f in futs:
                f.result()
    res.reports = reports
    _mark("tail_commits")

    # ---- metrics: fold the committed per-partition lineage records instead
    # of re-scanning the silver table (the counts are already there)
    lineage_committed = (
        AtomicTable(out / "lineage").read(spark)
        .filter(F.col("snapshot_id") == f"{recorddate}-routed")
    )
    agg = (
        lineage_committed.select(F.explode("sink_counts").alias("category", "rows"))
        .groupBy("category").agg(F.sum("rows").alias("cnt"))
        .collect()
    )
    cat_counts = {r["category"]: r["cnt"] for r in agg}
    res.sink_counts = cat_counts
    res.rows_in = sum(cat_counts.values())
    res.elapsed_s = time.time() - t0
    res.phase_s["metrics"] = round(
        res.elapsed_s - sum(res.phase_s.values()), 2)
    for df in (access, was, err, gc, *persisted):
        df.unpersist()
    return res
