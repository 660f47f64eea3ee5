"""SQL surface parity: spark.sql over the registered views must equal the
DataFrame operators (same Catalyst plans, two authoring surfaces)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_parser_spark import sql as lsql
from log_parser_spark.operators import aggregates as A
from log_parser_spark.operators.parse import parsed_family
from log_parser_spark.sources.atomic import AtomicTable


@pytest.fixture(scope="module")
def sql_env(spark, dataset_dir, tmp_path_factory):
    from log_parser_spark.plans.pipeline import run_pipeline

    out = tmp_path_factory.mktemp("sql_out")
    run_pipeline(spark, dataset_dir, out)
    views = lsql.register_views(spark, out / "sinks", dataset_dir)
    return out, views


def test_views_registered(sql_env, spark):
    _, views = sql_env
    assert {"routed", "access", "was_events", "weberror", "gc_events"} <= set(views)
    assert spark.sql("SELECT COUNT(*) c FROM routed").collect()[0]["c"] > 0


def test_sql_matches_dataframe_status_counts(sql_env, spark):
    out, _ = sql_env
    got = {r["status"]: (r["cnt"], r["pct"])
           for r in spark.sql(lsql.CANNED["status_counts"]).collect()}
    sinks = AtomicTable(out / "sinks").read(spark)
    access = parsed_family(sinks, "access").filter(F.col("category") == "access")
    exp = {r["status"]: (r["cnt"], r["pct"]) for r in A.status_counts(access).collect()}
    assert got == exp


def test_sql_sink_counts_conserve(sql_env, spark, truth):
    got = {r["category"]: r["cnt"]
           for r in spark.sql(lsql.CANNED["sink_counts"]).collect()}
    assert got == truth["category"].value_counts().to_dict()


def test_all_canned_queries_run(sql_env, spark):
    for name, q in lsql.CANNED.items():
        assert spark.sql(q).count() >= 0, name
