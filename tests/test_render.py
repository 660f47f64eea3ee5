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
    # hourly matrix uses the reference's short headings
    assert "hr\tuuc\tart\t<=1\t<=5\t<=10\t<=20\t>20\txrc\tirc" in txt
    # all 24 hours present
    assert sum(1 for line in txt.splitlines()
               if line.split("\t")[0].strip().isdigit()) >= 24


def test_was_and_gc_reports(rendered):
    assert "===== Hung thread summary =====" in rendered["01_WASLogSummaryRpt.txt"]
    assert "===== GC summary by JVM and date =====" in rendered["04_GCSummaryRpt.txt"]
    assert "mpmstats: peak busy per server" in rendered["03_WebErrorLogSummaryRpt.txt"]
