"""Text-report rendering: reference section structure + sane values."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def rendered(spark, dataset_dir, tmp_path_factory):
    from log_parser_spark.plans.pipeline import run_pipeline
    from log_parser_spark.reports import render_all

    out = tmp_path_factory.mktemp("render_out")
    res = run_pipeline(spark, dataset_dir, out)
    files = render_all(out, res.reports, "2015-06-13")
    return {f.name: f.read_text() for f in files}


def test_four_reports_written(rendered):
    assert set(rendered) == {
        "01_WASLogSummaryRpt.txt", "02_WebAccessLogSummaryRpt.txt",
        "03_WebErrorLogSummaryRpt.txt", "04_GCSummaryRpt.txt",
    }


def test_access_report_sections(rendered):
    """Section titles mirror sample_reports/02_WebAccessLogSummaryRpt.txt."""
    txt = rendered["02_WebAccessLogSummaryRpt.txt"]
    for sec in [
        "Http Access log analysis report",
        "Hourly Statistics",
        "Overall-Daily Statistics",
        "Statistics by Web Server(IHS)  and WebSphere App Server (WAS)",
        "Statistics by HTTP response code",
        "Top 10 (slowest) responses by Response Time",
        "Top 10 (by count) URL ending with HTTP response code 400 and higher",
        "Summary by Extension",
        "Browser Usage Statistics",
    ]:
        assert f"===== {sec} =====" in txt, sec
    # hourly matrix uses the reference's short headings incl. usc
    # (sample_reports/02_WebAccessLogSummaryRpt.txt:54)
    assert "hr\tuuc\tusc\tart\t<=1\t<=5\t<=10\t<=20\t>20\txrc\tirc" in txt
    # all 24 hours present
    assert sum(1 for line in txt.splitlines()
               if line.split("\t")[0].strip().isdigit()) >= 24
    for sec in [
        "Summary by Domain - Top 5 (slowest) by average response time",
        "Top 5 (slowest) UIDs by Average Response Time",
        "OS Usage Statistics",
    ]:
        assert f"===== {sec} =====" in txt, sec


def test_hourly_matrix_field_level(rendered, dataset_dir):
    """Field-level parity of the hourly table with the reference layout
    (sample_reports/02:54-): per row hr, uuc, usc, art then five range
    PERCENTAGES of xrc that sum to ~100 where xrc>0, then xrc, irc; and the
    xrc/irc totals must equal the truth's non-excluded/total access rows."""
    import pandas as pd

    txt = rendered["02_WebAccessLogSummaryRpt.txt"]
    lines = txt.splitlines()
    hdr = lines.index("hr\tuuc\tusc\tart\t<=1\t<=5\t<=10\t<=20\t>20\txrc\tirc")
    rows = []
    for ln in lines[hdr + 1: hdr + 25]:
        f = ln.split("\t")
        rows.append(dict(
            hr=int(f[0]), uuc=int(f[1]), usc=int(f[2]), art=float(f[3]),
            pcs=[float(x) for x in f[4:9]], xrc=int(f[9]), irc=int(f[10])))
    assert [r["hr"] for r in rows] == list(range(24))
    for r in rows:
        if r["xrc"] > 0:
            assert abs(sum(r["pcs"]) - 100.0) < 0.01, r
        assert r["usc"] >= 0 and r["irc"] >= r["xrc"]

    truth = pd.read_parquet(dataset_dir / "truth.parquet")
    t = truth[(truth.category == "access") & (truth.event_date == "2015-06-13")]
    assert sum(r["irc"] for r in rows) == len(t)
    sess = t[t.a_jsession != "-"]
    exp_usc = sess.groupby("hour")["a_jsession"].nunique()
    got_usc = {r["hr"]: r["usc"] for r in rows}
    for h, v in exp_usc.items():
        assert got_usc[h] == v, h


def _section_rows(txt: str, title: str, header: str) -> list[list[str]]:
    """Rows of the tab-separated table that follows a ===== title ===== banner."""
    lines = txt.splitlines()
    i = lines.index(f"===== {title} =====")
    j = i + 1
    while lines[j] != header:
        j += 1
    rows = []
    for ln in lines[j + 1:]:
        if not ln.strip() or ln.startswith("="):
            break
        rows.append(ln.split("\t"))
    return rows


@pytest.fixture(scope="module")
def access_truth(dataset_dir):
    """Truth rows the date-gated access frame aggregates over, plus the F4
    exclusion flag replicated in pandas (webAccessLogParser.sh:742)."""
    import pandas as pd

    truth = pd.read_parquet(dataset_dir / "truth.parquet")
    t = truth[(truth.category == "access") & (truth.event_date == "2015-06-13")].copy()
    t["excluded"] = (
        t.a_status.eq(304)
        | t.a_ext.fillna("").str.fullmatch(
            "jpg|gif|png|ico|js|css|woff|swf|jar|htm|html|txt")
        | t.a_uri_path.fillna("").str.contains(
            r"(?:\.css\.xhtml$|\.js\.xhtml$|\.png\.xhtml$|\.gif\.xhtml$)")
        | t.a_params.fillna("").str.contains("WilyCmd=cmdMetrics")
    )
    return t


def test_response_code_table_values(rendered, access_truth):
    """Golden values for the HTTP response-code section
    (webAccessLogParser.sh:1176-1184): exact count and pct per status."""
    rows = _section_rows(rendered["02_WebAccessLogSummaryRpt.txt"],
                         "Statistics by HTTP response code", "rsp\tcnt\tpc")
    exp = access_truth.groupby("a_status").size().sort_index()
    total = exp.sum()
    assert [int(r[0]) for r in rows] == [int(s) for s in exp.index]
    for r, (status, cnt) in zip(rows, exp.items()):
        assert int(r[1]) == cnt, status
        assert r[2] == format(round(cnt / total * 100, 2), "7.2f"), status


def test_server_stats_table_values(rendered, access_truth):
    """Golden values for the per-server section (sh:1071-1107): uuc, usc,
    art over non-excluded rows, xrc, irc per web server."""
    rows = _section_rows(
        rendered["02_WebAccessLogSummaryRpt.txt"],
        "Statistics by Web Server(IHS)  and WebSphere App Server (WAS)",
        "srv\tuuc\tusc\tart\txrc\tirc")
    got = {r[0]: r[1:] for r in rows}
    t = access_truth
    assert sorted(got) == sorted(t["source"].unique())
    for srv, g in t.groupby("source"):
        uuc = g["a_uid"].nunique()
        sess = g[g.a_jsession != "-"]
        jsc = len(sess[["a_clone_id", "a_jsession"]].drop_duplicates())
        xcl = g[~g.excluded]
        art = round(round(xcl["a_rt"].sum(), 6) / len(xcl), 6) if len(xcl) else 0.0
        r = got[srv]
        assert [int(r[0]), int(r[1])] == [uuc, jsc], srv
        assert r[2] == format(art, "7.3f"), srv
        assert [int(r[3]), int(r[4])] == [len(xcl), len(g)], srv


def test_top_slowest_table_values(rendered, access_truth):
    """Golden values for the top-10-slowest section (sh:1300-1329): exact
    (rt, status, uid, url) rows in (rt desc, doc_id) order."""
    rows = _section_rows(rendered["02_WebAccessLogSummaryRpt.txt"],
                         "Top 10 (slowest) responses by Response Time",
                         "rt\trsp\tuid\turl")
    exp = access_truth.sort_values(
        ["a_rt", "doc_id"], ascending=[False, True]).head(10)
    assert len(rows) == 10
    for r, e in zip(rows, exp.itertuples()):
        assert r[0] == format(e.a_rt, "9.4f")
        assert (int(r[1]), r[2], r[3]) == (e.a_status, e.a_uid, e.a_uri_path)


def test_top_error_urls_table_values(rendered, access_truth):
    """Golden values for the 400+ URL section (sh:1357-1381): per-(uri,
    status) counts in (cnt desc, uri, status) order."""
    rows = _section_rows(
        rendered["02_WebAccessLogSummaryRpt.txt"],
        "Top 10 (by count) URL ending with HTTP response code 400 and higher",
        "cnt\trsp\turl")
    exp = (
        access_truth[access_truth.a_status >= 400]
        .groupby(["a_uri_path", "a_status"]).size().reset_index(name="cnt")
        .sort_values(["cnt", "a_uri_path", "a_status"],
                     ascending=[False, True, True])
        .head(10)
    )
    assert len(rows) == min(10, len(exp))
    for r, e in zip(rows, exp.itertuples()):
        assert (int(r[0]), int(r[1]), r[2]) == (e.cnt, e.a_status, e.a_uri_path)


def test_was_and_gc_reports(rendered):
    assert "===== Hung thread summary =====" in rendered["01_WASLogSummaryRpt.txt"]
    assert "===== GC summary by JVM and date =====" in rendered["04_GCSummaryRpt.txt"]
    assert "mpmstats: peak busy per server" in rendered["03_WebErrorLogSummaryRpt.txt"]


@pytest.fixture(scope="module")
def day_truth(dataset_dir):
    """Truth rows inside the F8 summarize-date gate (all categories — the
    family frames the WAS/GC/error reports read are not category-filtered)."""
    import pandas as pd

    truth = pd.read_parquet(dataset_dir / "truth.parquet")
    return truth[truth.event_date == "2015-06-13"]


def test_hung_thread_summary_values(rendered, day_truth):
    """Golden nhtc/mhtc/rhtc per JVM vs generator truth
    (websphereLogParser.sh:443-532): rhtc is the chtc of the numerically
    time-ordered LAST hung/release event."""
    rows = _section_rows(rendered["01_WASLogSummaryRpt.txt"],
                         "Hung thread summary", "jvm\tnhtc\tmhtc\trhtc")
    h = day_truth[(day_truth.family == "was")
                  & day_truth.w_code.isin(["WSVR0605W", "WSVR0606W"])]
    assert [r[0] for r in rows] == sorted(h.source.unique())
    for r in rows:
        grp = h[h.source == r[0]]
        nhtc = int((grp.w_code == "WSVR0605W").sum())
        mhtc = int(grp.w_chtc.max())
        last = grp.sort_values(["secs", "doc_id"]).iloc[-1]
        assert int(r[1]) == nhtc, r[0]
        assert int(r[2]) == mhtc, r[0]
        assert int(r[3]) == int(last.w_chtc), r[0]


def test_mpm_peak_values(rendered, day_truth):
    """Golden per-server peak-busy row (webErrorLogParser.sh:361-373):
    argmax bsy with the operator's (bsy, time-string) tiebreak."""
    rows = _section_rows(rendered["03_WebErrorLogSummaryRpt.txt"],
                         "mpmstats: peak busy per server",
                         "srv\ttime\tbsy\trdy")
    m = day_truth[(day_truth.family == "weberror")
                  & (day_truth.e_subtype == "mpm_global")].copy()
    m["time"] = m.secs.map(  # error_log stamps carry a zero-padded hour
        lambda s: f"{int(s)//3600:02d}:{(int(s)%3600)//60:02d}:{int(s)%60:02d}")
    assert [r[0] for r in rows] == sorted(m.source.unique())
    for r in rows:
        grp = m[m.source == r[0]]
        peak = grp.sort_values(["e_bsy", "time"]).iloc[-1]
        assert r[1] == peak.time, r[0]
        assert int(r[2]) == int(peak.e_bsy), r[0]
        assert int(r[3]) == int(peak.e_rdy), r[0]


def test_gc_daily_values(rendered, day_truth):
    """Golden per-(jvm, date) GC counts and rounded avg real times
    (javaGCStatsParser.sh:455-473,511-551)."""
    rows = _section_rows(rendered["04_GCSummaryRpt.txt"],
                         "GC summary by JVM and date",
                         "jvm\tdate\tgc\tfgc\tagcrt\tafgcrt")
    g = day_truth[day_truth.family == "gc"]
    assert [r[0] for r in rows] == sorted(g.source.unique())
    for r in rows:
        grp = g[g.source == r[0]]
        gc_cnt = int((grp.g_type == "GC").sum())
        fgc_cnt = int((grp.g_type == "FULLGC").sum())
        fgc_all = int((grp.g_type != "GC").sum())
        gc_real = round(float(grp.loc[grp.g_type == "GC", "g_real"].sum()), 2)
        fgc_real = round(float(grp.loc[grp.g_type != "GC", "g_real"].sum()), 2)
        assert int(r[2]) == gc_cnt, r[0]
        assert int(r[3]) == fgc_cnt, r[0]
        agc = round(gc_real / gc_cnt, 4) if gc_cnt else 0.0
        afgc = round(fgc_real / fgc_all, 4) if fgc_all else 0.0
        assert r[4] == format(agc, "7.3f"), r[0]
        assert r[5] == format(afgc, "7.3f"), r[0]


def test_browser_and_os_usage_values(rendered, access_truth):
    """Golden values for Browser/OS usage (webAccessLogParser.sh:735-736,
    1463-1513): distinct-uid count per browser/OS + percentage of total,
    sorted by count desc."""
    for sec, hdr, col in [
        ("Browser Usage Statistics", "bwsr\tuuc\tuupc", "a_browser"),
        ("OS Usage Statistics", "os\tuuc\tuupc", "a_os"),
    ]:
        rows = _section_rows(rendered["02_WebAccessLogSummaryRpt.txt"], sec, hdr)
        exp = access_truth.groupby(col)["a_uid"].nunique()
        total = exp.sum()
        exp = exp.reset_index().sort_values(["a_uid", col],
                                            ascending=[False, True])
        assert [r[0] for r in rows] == exp[col].tolist(), sec
        for r, (_, e) in zip(rows, exp.iterrows()):
            assert int(r[1]) == e["a_uid"], (sec, r)
            assert r[2] == format(round(e["a_uid"] / total * 100, 2), "7.2f"), (sec, r)


def test_status_by_server_matrix_values(rendered, access_truth):
    """Golden values for the response-code x server matrix
    (webAccessLogParser.sh:674,826-847): every cell equals the truth's
    (server, status) count; absent combinations are 0."""
    txt = rendered["02_WebAccessLogSummaryRpt.txt"]
    lines = txt.splitlines()
    i = lines.index("===== Response code counts by Web Server =====")
    hdr_line = next(ln for ln in lines[i:] if ln.startswith("srv\t"))
    hdr = hdr_line.split("\t")
    assert all(h.startswith("s") for h in hdr[1:])
    rows = _section_rows(txt, "Response code counts by Web Server", hdr_line)
    exp = access_truth.groupby(["source", "a_status"]).size()
    servers = sorted(access_truth.source.unique())
    assert [r[0] for r in rows] == servers
    seen = 0
    for r in rows:
        for h, v in zip(hdr[1:], r[1:]):
            e = int(exp.get((r[0], int(h[1:])), 0))
            assert int(v) == e, (r[0], h)
            seen += e
    # the fixed code list covers the whole corpus (no silent drop)
    assert seen == len(access_truth)


def test_domain_hour_pivot_values(rendered, access_truth):
    """Golden values for the domain-hour pivots (sh:916-934,1241-1270):
    H0..H23 distinct users / distinct sessions per domain."""
    txt = rendered["02_WebAccessLogSummaryRpt.txt"]
    hdr = "Domain\t" + "\t".join(f"H{h}" for h in range(24))

    rows = _section_rows(txt, "Hourly Unique User count by Domain", hdr)
    exp = access_truth.groupby(["a_domain", "hour"])["a_uid"].nunique()
    assert [r[0] for r in rows] == sorted(access_truth.a_domain.unique())
    for r in rows:
        for h in range(24):
            assert int(r[1 + h]) == int(exp.get((r[0], h), 0)), (r[0], h)

    rows = _section_rows(txt, "Hourly Session count by Domain", hdr)
    sess = access_truth[access_truth.a_jsession != "-"]
    exp = sess.groupby(["a_domain", "hour"])["a_jsession"].nunique()
    assert [r[0] for r in rows] == sorted(sess.a_domain.unique())
    for r in rows:
        for h in range(24):
            assert int(r[1 + h]) == int(exp.get((r[0], h), 0)), (r[0], h)


def test_weberror_summary_values(rendered, day_truth):
    """Golden values for the error-log summary (webErrorLogParser.sh:
    319-320,381-448): client_err counts by server and by (level, errmsg)."""
    err = day_truth[(day_truth.family == "weberror")
                    & (day_truth.e_subtype == "client_err")]
    txt = rendered["03_WebErrorLogSummaryRpt.txt"]

    rows = _section_rows(txt, "Error counts by server", "srv\tcnt")
    exp = err.groupby("source").size().sort_index()
    assert [r[0] for r in rows] == list(exp.index)
    assert [int(r[1]) for r in rows] == exp.tolist()

    rows = _section_rows(txt, "Error counts by (error, detail)",
                         "lvl\terr\tcnt")
    exp = err.groupby(["e_level", "e_errmsg"]).size().sort_index()
    assert [(r[0], r[1]) for r in rows] == list(exp.index)
    assert [int(r[2]) for r in rows] == exp.tolist()
