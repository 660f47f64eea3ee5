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


def test_was_and_gc_reports(rendered):
    assert "===== Hung thread summary =====" in rendered["01_WASLogSummaryRpt.txt"]
    assert "===== GC summary by JVM and date =====" in rendered["04_GCSummaryRpt.txt"]
    assert "mpmstats: peak busy per server" in rendered["03_WebErrorLogSummaryRpt.txt"]
