"""End-to-end pipeline run + crash/resume idempotence (north rule)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_parser_spark.plans.pipeline import read_report, run_pipeline
from log_parser_spark.sources.atomic import AtomicTable


def test_pipeline_runs_and_routes(spark, dataset_dir, truth, tmp_path):
    res = run_pipeline(spark, dataset_dir, tmp_path / "out")
    exp = truth["category"].value_counts().to_dict()
    assert res.sink_counts == exp
    assert res.rows_in == len(truth)

    # sinks on disk: union of categories == input, no duplicates
    sinks = AtomicTable(tmp_path / "out" / "sinks").read(spark)
    assert sinks.count() == len(truth)
    assert sinks.select("doc_id").distinct().count() == len(truth)
    on_disk = {r["category"]: r["cnt"] for r in
               sinks.groupBy("category").agg(F.count("*").alias("cnt")).collect()}
    assert on_disk == exp

    # lineage conservation: rows_in == matched + unmatched
    lineage = AtomicTable(tmp_path / "out" / "lineage").read(spark)
    tot = lineage.agg(F.sum("rows_in").alias("a"), F.sum("rows_matched").alias("b"),
                      F.sum("rows_unmatched").alias("c")).collect()[0]
    assert tot["a"] == len(truth)
    assert tot["b"] + tot["c"] == tot["a"]
    assert tot["c"] == exp["unmatched"]

    # some reports materialized
    sc = read_report(spark, tmp_path / "out", "status_counts")
    assert sc.count() > 0

    # north-rule invariant: token-array equality per routed row, via the
    # line<->tokens bijection view over the sink's byte-string column
    from log_parser_spark.functions.detokenize import with_tokens_view
    from log_parser_spark.sources.token_table import read_token_sequences

    original = read_token_sequences(spark, dataset_dir).select(
        "doc_id", F.col("tokens").alias("tokens_in"))
    joined = with_tokens_view(sinks).select("doc_id", "tokens").join(original, "doc_id")
    assert joined.filter(F.col("tokens") != F.col("tokens_in")).count() == 0
    assert joined.count() == len(truth)


def test_pipeline_resume_no_duplicates(spark, dataset_dir, truth, tmp_path):
    out = tmp_path / "resume_out"
    with pytest.raises(RuntimeError, match="injected crash"):
        run_pipeline(spark, dataset_dir, out, stop_after=3)

    # restart: previously committed txids are skipped, the rest complete
    res = run_pipeline(spark, dataset_dir, out)
    assert len(res.skipped) == 3
    assert res.sink_counts == truth["category"].value_counts().to_dict()

    sinks = AtomicTable(out / "sinks").read(spark)
    assert sinks.count() == len(truth)
    assert sinks.select("doc_id").distinct().count() == len(truth)

    # third run: everything is a no-op
    res2 = run_pipeline(spark, dataset_dir, out)
    assert not res2.committed
