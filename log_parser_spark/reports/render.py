"""Text-report renderer: the reference's user-facing artifact.

Reproduces the section structure of the reference summary reports
(sample_reports/01..04_*.txt; emitted by webAccessLogParser.sh:983-1513,
websphereLogParser.sh:443-856, webErrorLogParser.sh:381-448,
javaGCStatsParser.sh:556-622): banner sections, the hourly matrix with the
reference's short-heading columns (hr uuc art <=1 .. >20 xrc irc), per-server
stats, response-code table, the top-N lists, browser/OS usage, and the
per-family summaries. Values come from the committed report snapshots, so
rendering is a driver-side format of already-small frames — no extra
cluster work.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame

BAR = "=" * 53


def _sec(*titles: str) -> str:
    lines = [BAR] + [f"===== {t} =====" for t in titles] + [BAR]
    return "\n".join(lines) + "\n"


def _table(pdf, cols: list[tuple[str, str, str]]) -> str:
    """cols: (df_column, heading, format)."""
    out = ["\t".join(h for _, h, _ in cols)]
    for row in pdf.itertuples(index=False):
        d = row._asdict()
        out.append("\t".join(
            ("" if d.get(c) is None else format(d.get(c), fmt)) for c, _, fmt in cols
        ))
    return "\n".join(out) + "\n"


def _pd(df: DataFrame):
    return df.toPandas()


def render_access_summary(rpts: dict[str, DataFrame], recorddate: str) -> str:
    """02_WebAccessLogSummaryRpt.txt analogue (webAccessLogParser.sh:42,983-1513)."""
    s = [_sec("Http Access log analysis report",
              f"based on access logs dated: {recorddate}")]

    daily = _pd(rpts["daily_rollup"])
    if len(daily):
        d = daily.iloc[0].to_dict()
        s.append(_sec("Overall-Daily Statistics"))
        s.append(
            "date\t\tuuc\tusc\tart\txrc\tirc\n"
            f"{recorddate}\t{int(d.get('uuc', 0))}\t{int(d.get('jsc', 0))}"
            f"\t{d.get('art', 0.0):.3f}\t{int(d.get('cnt_xcl', 0))}\t{int(d.get('cnt_incl', 0))}\n"
        )

    hourly = _pd(rpts["hourly_stats"])
    s.append(_sec("Hourly Statistics"))
    for i in range(1, 6):
        hourly[f"r{i}_pc"] = (
            hourly[f"r{i}_cnt"] / hourly["cnt_xcl"].where(hourly["cnt_xcl"] > 0) * 100
        ).fillna(0.0)
    # usc column (sample_reports/02:54): hourly distinct sessions
    if "hourly_sessions" in rpts:
        hs = _pd(rpts["hourly_sessions"]).rename(columns={"jsc": "usc"})
        hourly = hourly.merge(hs, on="hour", how="left").fillna({"usc": 0})
        hourly["usc"] = hourly["usc"].astype(int)
    else:
        hourly["usc"] = 0
    s.append(_table(hourly, [
        ("hour", "hr", "<3d"), ("uuc", "uuc", "5d"), ("usc", "usc", "5d"),
        ("art", "art", "7.3f"),
        ("r1_pc", "<=1", "7.3f"), ("r2_pc", "<=5", "7.3f"),
        ("r3_pc", "<=10", "7.3f"), ("r4_pc", "<=20", "7.3f"),
        ("r5_pc", ">20", "7.3f"),
        ("cnt_xcl", "xrc", "8d"), ("cnt_incl", "irc", "8d"),
    ]))

    srv = _pd(rpts["server_stats"])
    s.append(_sec("Statistics by Web Server(IHS)  and WebSphere App Server (WAS)"))
    s.append(_table(srv, [
        ("web_server", "srv", "s"), ("uuc", "uuc", "5d"), ("jsc", "usc", "5d"),
        ("art", "art", "7.3f"), ("cnt_xcl", "xrc", "8d"), ("cnt_incl", "irc", "8d"),
    ]))

    rc = _pd(rpts["status_counts"])
    s.append(_sec("Statistics by HTTP response code"))
    s.append(_table(rc, [
        ("status", "rsp", "d"), ("cnt", "cnt", "8d"), ("pct", "pc", "7.2f"),
    ]))

    # response-code x server matrix (webAccessLogParser.sh:674,826-847):
    # one row per server, one fixed column per code
    if "status_by_server" in rpts:
        mat = _pd(rpts["status_by_server"])
        s.append(_sec("Response code counts by Web Server"))
        s.append(_table(mat, [("web_server", "srv", "s")] + [
            (c, c, "6d") for c in mat.columns if c != "web_server"
        ]))

    # request-method x server matrix (sh:673,794-824) — same layout
    if "method_by_server" in rpts:
        mm = _pd(rpts["method_by_server"])
        s.append(_sec("Request method counts by Web Server"))
        s.append(_table(mm, [("web_server", "srv", "s")] + [
            (c, c, "6d") for c in mm.columns if c != "web_server"
        ]))

    top = _pd(rpts["top_slowest"])
    s.append(_sec("Top 10 (slowest) responses by Response Time"))
    s.append(_table(top, [
        ("rt", "rt", "9.4f"), ("status", "rsp", "d"), ("uid", "uid", "s"),
        ("uri_path", "url", "s"),
    ]))

    err = _pd(rpts["top_error_urls"])
    s.append(_sec("Top 10 (by count) URL ending with HTTP response code 400 and higher"))
    s.append(_table(err, [
        ("cnt", "cnt", "6d"), ("status", "rsp", "d"), ("uri", "url", "s"),
    ]))

    if "top_domains_by_art" in rpts:
        dom = _pd(rpts["top_domains_by_art"])
        s.append(_sec("Summary by Domain - Top 5 (slowest) by average response time"))
        s.append(_table(dom, [
            ("domain", "domain", "s"), ("cnt", "cnt", "8d"),
            ("art", "art", "7.3f"),
        ]))

    if "top_uids_by_art" in rpts:
        uid5 = _pd(rpts["top_uids_by_art"])
        s.append(_sec("Top 5 (slowest) UIDs by Average Response Time"))
        s.append(_table(uid5, [
            ("uid", "uid", "s"), ("cnt", "cnt", "8d"), ("art", "art", "7.3f"),
        ]))

    if "domain_daily_summary" in rpts:
        dds = _pd(rpts["domain_daily_summary"])
        s.append(_sec("Daily Unique User and Session count by Domain"))
        s.append(_table(dds, [
            ("domain", "Domain", "s"), ("uuc", "uuc", "5d"), ("usc", "usc", "5d"),
        ]))

    # domain-hour pivots (sh:916-934,1241-1270): Domain, H0..H23. The
    # pivot's numeric column names get renamed (itertuples mangles
    # non-identifier names to _1.._24).
    _hmap = {str(h): f"H{h}" for h in range(24)}
    _hcols = [(f"H{h}", f"H{h}", "5d") for h in range(24)]
    if "domain_hour_users" in rpts:
        dhu = _pd(rpts["domain_hour_users"]).rename(columns=_hmap)
        s.append(_sec("Hourly Unique User count by Domain"))
        s.append(_table(dhu, [("domain", "Domain", "s")] + _hcols))

    if "domain_hour_sessions" in rpts:
        dhs = _pd(rpts["domain_hour_sessions"]).rename(columns=_hmap)
        s.append(_sec("Hourly Session count by Domain"))
        s.append(_table(dhs, [("domain", "Domain", "s")] + _hcols))

    ext = _pd(rpts["ext_stats"])
    s.append(_sec("Summary by Extension"))
    s.append(_table(ext, [
        ("ext", "ext", "s"), ("cnt", "cnt", "8d"), ("art", "art", "7.3f"),
    ]))

    br = _pd(rpts["browser_usage"])
    s.append(_sec("Browser Usage Statistics"))
    s.append(_table(br, [
        ("browser", "bwsr", "s"), ("uuc", "uuc", "5d"), ("pct", "uupc", "7.2f"),
    ]))

    osx = _pd(rpts["os_usage"])
    s.append(_sec("OS Usage Statistics"))  # sample_reports/02:279
    s.append(_table(osx, [
        ("os_name", "os", "s"), ("uuc", "uuc", "5d"), ("pct", "uupc", "7.2f"),
    ]))
    return "\n".join(s)


def render_was_summary(rpts: dict[str, DataFrame], recorddate: str) -> str:
    """01_WASLogSummaryRpt.txt analogue (websphereLogParser.sh:54,443-856)."""
    s = [_sec("WebSphere SystemOut log analysis report",
              f"based on logs dated: {recorddate}")]
    hung = _pd(rpts["hung_threads"])
    s.append(_sec("Hung thread summary"))
    s.append(_table(hung, [
        ("jvm", "jvm", "s"), ("nhtc", "nhtc", "5d"), ("mhtc", "mhtc", "5d"),
        ("rhtc", "rhtc", "5d"),
    ]))
    tto = _pd(rpts["tto"])
    s.append(_sec("Transaction timeout (TTO) summary"))
    s.append(_table(tto, [("jvm", "jvm", "s"), ("tto_cnt", "cnt", "5d"), ("avg_timeout_s", "avgto", "7.1f")]))
    st = _pd(rpts["starvation"])
    s.append(_sec("CPU starvation summary"))
    s.append(_table(st, [
        ("jvm", "jvm", "s"), ("starv_cnt", "cnt", "5d"), ("sum_delay_s", "delay", "8.1f"),
    ]))
    ev = _pd(rpts["was_events_by_server"])
    s.append(_sec("Error/Warning counts by server"))
    s.append(_table(ev, [
        ("source", "srv", "s"), ("evt", "evt", "s"), ("cnt", "cnt", "7d"),
    ]))
    topc = _pd(rpts["was_top_errors_by_component"])
    s.append(_sec("Top 10 errors by component"))
    s.append(_table(topc, [
        ("component", "cmp", "s"), ("cnt", "cnt", "7d"),
    ]))
    return "\n".join(s)


def render_weberror_summary(rpts: dict[str, DataFrame], recorddate: str) -> str:
    """03_WebErrorLogSummaryRpt.txt analogue (webErrorLogParser.sh:39,381-448)."""
    s = [_sec("Http error log analysis report",
              f"based on error logs dated: {recorddate}")]
    by_srv = _pd(rpts["weberror_by_server"])
    s.append(_sec("Error counts by server"))
    s.append(_table(by_srv, [("web_server", "srv", "s"), ("err_cnt", "cnt", "7d")]))
    by_msg = _pd(rpts["weberror_by_msg"])
    s.append(_sec("Error counts by (error, detail)"))
    s.append(_table(by_msg, [
        ("level", "lvl", "s"), ("errmsg", "err", "s"), ("cnt", "cnt", "7d"),
    ]))
    peak = _pd(rpts["mpm_peak"])
    s.append(_sec("mpmstats: peak busy per server"))
    s.append(_table(peak, [
        ("web_server", "srv", "s"), ("time", "time", "s"), ("bsy", "bsy", "5d"),
        ("rdy", "rdy", "5d"),
    ]))
    return "\n".join(s)


def render_gc_summary(rpts: dict[str, DataFrame], recorddate: str) -> str:
    """04_GCSummaryRpt.txt analogue (javaGCStatsParser.sh:48,556-622)."""
    s = [_sec("Java verbose-GC analysis report",
              f"based on GC logs dated: {recorddate}")]
    daily = _pd(rpts["gc_daily"])
    s.append(_sec("GC summary by JVM and date"))
    s.append(_table(daily, [
        ("jvm", "jvm", "s"), ("event_date", "date", "s"),
        ("gc_cnt", "gc", "6d"), ("fgc_cnt", "fgc", "5d"),
        ("avg_gc_real_s", "agcrt", "7.3f"), ("avg_fgc_real_s", "afgcrt", "7.3f"),
    ]))
    last = _pd(rpts["gc_last"])
    s.append(_sec("Last GC record per JVM"))
    s.append(_table(last, [
        ("jvm", "jvm", "s"), ("ts_raw", "ts", "s"), ("gc_type", "type", "s"),
        ("heap_after_kb", "heapaf", "10.0f"),
    ]))
    return "\n".join(s)


def render_all(out_dir: str | Path, rpts: dict[str, DataFrame], recorddate: str) -> list[Path]:
    """Write the four summary text reports (S6 naming: NN_*.txt)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    files = {
        "01_WASLogSummaryRpt.txt": render_was_summary,
        "02_WebAccessLogSummaryRpt.txt": render_access_summary,
        "03_WebErrorLogSummaryRpt.txt": render_weberror_summary,
        "04_GCSummaryRpt.txt": render_gc_summary,
    }
    written = []
    for name, fn in files.items():
        p = out / name
        p.write_text(fn(rpts, recorddate))
        written.append(p)
    return written
