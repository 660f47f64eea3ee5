"""Multi-day history accumulation (S8) + hot-source skew spreading (route)."""

from __future__ import annotations

from pyspark.sql import functions as F

from log_parser_spark.plans.pipeline import read_report, run_pipeline
from log_parser_spark.sources.atomic import AtomicTable


def test_history_appends_across_days(spark, dataset_dir, tmp_path, truth):
    """Running the daily job for two record dates appends one history row
    set per day (create-then-append, webAccessLogParser.sh:57-126,985),
    and the SECOND run's numbers must come from its OWN snapshot only —
    not the union of every committed snapshot (round-1 advisor bug: counts
    doubled on the second run into a shared out dir)."""
    out = tmp_path / "multi"
    res1 = run_pipeline(spark, dataset_dir, out, recorddate="2015-06-13")
    res2 = run_pipeline(spark, dataset_dir, out, recorddate="2015-06-12")

    hist = AtomicTable(out / "history/http_perf").read(spark)
    dates = sorted(r["record_date"] for r in hist.select("record_date").collect())
    assert dates == ["2015-06-12", "2015-06-13"]

    # Both runs route the same corpus -> identical per-sink counts; under the
    # union-all-snapshots bug the second run saw every row twice.
    assert res2.sink_counts == res1.sink_counts

    # Report values for day 2 must match the single-copy truth.
    sc = read_report(spark, out, "status_counts", txid="2015-06-12")
    got = sum(r["cnt"] for r in sc.collect())
    exp = int(((truth.category == "access") & (truth.event_date == "2015-06-12")).sum())
    assert got == exp

    # re-running a day is a no-op (idempotent txid)
    res = run_pipeline(spark, dataset_dir, out, recorddate="2015-06-13")
    assert not res.committed
    assert AtomicTable(out / "history/http_perf").read(spark).count() == 2


def test_salted_repartition_spreads_hot_sink(spark, dataset_dir, classified):
    """The hot category (access ~70% of rows) must not collapse onto one
    writer task after the salted repartition (SURVEY.md §4 skew)."""
    from log_parser_spark.operators.route import salted

    parts = 16
    dist = (
        salted(classified, parts, "category")
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    counts = [r["count"] for r in dist]
    total = sum(counts)
    assert len(counts) == parts
    # no single partition owns more than ~2x the fair share
    assert max(counts) < 2.0 * total / parts
