"""End-to-end parse/classify/route correctness vs generator truth."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from log_parser_spark.operators.parse import parsed_family


def test_detokenize_roundtrip(classified, raw_lines):
    got = classified.select("doc_id", "line").toPandas().set_index("doc_id")["line"]
    exp = raw_lines.set_index("doc_id")["line"]
    joined = pd.concat([got, exp], axis=1, keys=["got", "exp"])
    assert joined["got"].equals(joined["exp"])


def test_family_and_category_match_truth(classified, truth):
    got = classified.select("doc_id", "family", "category").toPandas()
    m = got.merge(truth[["doc_id", "family", "category"]], on="doc_id",
                  suffixes=("_got", "_exp"))
    assert len(m) == len(truth)
    # category must match exactly (routing correctness)
    bad = m[m.category_got != m.category_exp]
    assert bad.empty, bad.head(10).to_string()
    # family matches except broken access lines that fail even family detect
    fam_bad = m[(m.family_got != m.family_exp) & ~(
        (m.family_exp == "access") & (m.family_got == "garbage")
    )]
    assert fam_bad.empty, fam_bad.head(10).to_string()


def test_fused_parse_matches_expression_classify(classified, token_df):
    """The fused Arrow kernel (the pipeline's parse path) must agree with the
    expression-based classify() on routing AND the unmatched subtype —
    they are two implementations of the same router."""
    from log_parser_spark.operators.parse import fused_parse

    fused = fused_parse(token_df).select(
        "doc_id", "family", "category", "discard_reason").toPandas()
    expr = classified.select(
        "doc_id", "family", "category", "discard_reason").toPandas()
    m = fused.merge(expr, on="doc_id", suffixes=("_f", "_e"))
    assert len(m) == len(expr)
    for c in ("family", "category", "discard_reason"):
        bad = m[m[f"{c}_f"].fillna("") != m[f"{c}_e"].fillna("")]
        assert bad.empty, (c, bad.head(10).to_string())


def test_sink_union_equals_input(classified, truth):
    # counts conservation: rows_in == sum over sinks (A25 / north rule)
    counts = {r["category"]: r["cnt"] for r in
              classified.groupBy("category").agg(F.count("*").alias("cnt")).collect()}
    exp = truth["category"].value_counts().to_dict()
    assert counts == exp


def test_access_fields_match_truth(classified, truth):
    acc = parsed_family(classified, "access").filter(F.col("category") == "access")
    got = acc.select(
        "doc_id", "method", "uri_path", "params", "domain", "page", "ext",
        "status", "rt", "uid", "clone_id", "browser", "os_name",
        "event_date", "hour", "range",
    ).toPandas().set_index("doc_id").sort_index()

    t = truth[truth.category == "access"].set_index("doc_id").sort_index()
    assert len(got) == len(t)
    assert (got["method"] == t["a_method"]).all()
    assert (got["uri_path"] == t["a_uri_path"]).all()
    assert (got["params"] == t["a_params"]).all()
    assert (got["domain"] == t["a_domain"]).all()
    assert (got["ext"] == t["a_ext"]).all()
    assert (got["status"].astype(int) == t["a_status"].astype(int)).all()
    assert (got["rt"] - t["a_rt"]).abs().max() < 1e-9
    assert (got["uid"] == t["a_uid"]).all()
    assert (got["clone_id"].fillna("") == t["a_clone_id"].fillna("")).all()
    assert (got["browser"] == t["a_browser"]).all()
    assert (got["os_name"] == t["a_os"]).all()
    assert (got["event_date"] == t["event_date"]).all()
    assert (got["hour"].astype(int) == t["hour"].astype(int)).all()


def test_response_range_boundaries(classified, truth):
    """P8: boundaries 1/5/10/20s are INCLUSIVE upper bounds."""
    acc = parsed_family(classified, "access").filter(F.col("category") == "access")
    got = acc.select("rt", "range").toPandas()
    import numpy as np

    exp = np.select(
        [got.rt <= 1.0, got.rt <= 5.0, got.rt <= 10.0, got.rt <= 20.0],
        ["<=1Sec", "<=5Sec", "<=10Sec", "<=20Sec"],
        default=">20Sec",
    )
    assert (got["range"] == exp).all()
    # the generator pins the 4 exact boundary rows
    for rt, lbl in [(1.0, "<=1Sec"), (5.0, "<=5Sec"), (10.0, "<=10Sec"), (20.0, "<=20Sec")]:
        sub = got[got.rt == rt]
        assert not sub.empty and (sub["range"] == lbl).all()


def test_was_fields_match_truth(classified, truth):
    was = parsed_family(classified, "was")
    got = was.select("doc_id", "evt", "component", "msg_code", "thread",
                     "timeout_s", "delay_s", "chtc", "is_oom", "event_date", "hour") \
        .toPandas().set_index("doc_id").sort_index()
    t = truth[truth.family == "was"].set_index("doc_id").sort_index()
    assert len(got) == len(t)
    assert (got["evt"] == t["w_evt"]).all()
    assert (got["component"] == t["w_component"]).all()
    assert (got["msg_code"] == t["w_code"]).all()
    assert (got["timeout_s"].astype(int) == t["w_timeout_s"].astype(int)).all()
    assert (got["delay_s"].astype(int) == t["w_delay_s"].astype(int)).all()
    assert (got["chtc"].astype(int) == t["w_chtc"].astype(int)).all()
    assert (got["is_oom"].astype(bool) == t["w_is_oom"].astype(bool)).all()
    assert (got["event_date"] == t["event_date"]).all()
    assert (got["hour"].astype(int) == t["hour"].astype(int)).all()


def test_weberror_fields_match_truth(classified, truth):
    err = parsed_family(classified, "weberror")
    got = err.select("doc_id", "level", "subtype", "client", "rdy", "bsy",
                     "mod1_n", "mod2_n", "event_date", "hour") \
        .toPandas().set_index("doc_id").sort_index()
    t = truth[truth.family == "weberror"].set_index("doc_id").sort_index()
    assert len(got) == len(t)
    assert (got["level"] == t["e_level"]).all()
    assert (got["subtype"] == t["e_subtype"]).all()
    assert (got["client"] == t["e_client"]).all()
    assert (got["rdy"].astype(int) == t["e_rdy"].astype(int)).all()
    assert (got["bsy"].astype(int) == t["e_bsy"].astype(int)).all()
    assert (got["mod1_n"].astype(int) == t["e_mod1"].astype(int)).all()
    assert (got["mod2_n"].astype(int) == t["e_mod2"].astype(int)).all()
    assert (got["event_date"] == t["event_date"]).all()


def test_gc_fields_match_truth(classified, truth):
    gc = parsed_family(classified, "gc")
    got = gc.select("doc_id", "gc_type", "secs", "real_s",
                    "young_before_kb", "old_after_kb", "perm_after_kb",
                    "heap_total_kb", "event_date", "hour") \
        .toPandas().set_index("doc_id").sort_index()
    t = truth[truth.family == "gc"].set_index("doc_id").sort_index()
    assert len(got) == len(t)
    assert (got["gc_type"] == t["g_type"]).all()
    assert (got["secs"] - t["g_secs"]).abs().max() < 1e-6
    assert (got["real_s"] - t["g_real"]).abs().max() < 1e-9
    assert (got["young_before_kb"] == t["g_young_before_kb"]).all()
    full = t["g_type"] != "GC"
    assert (got.loc[full, "old_after_kb"] == t.loc[full, "g_old_after_kb"]).all()
    assert (got.loc[full, "perm_after_kb"] == t.loc[full, "g_perm_after_kb"]).all()
    assert got.loc[~full, "old_after_kb"].isna().all()
    assert (got["heap_total_kb"] == t["g_heap_total_kb"]).all()
    assert (got["event_date"] == t["event_date"]).all()


def test_token_array_equality_per_surviving_row(classified, dataset_dir, spark):
    """North-rule invariant: tokens unchanged on every routed row."""
    from log_parser_spark.sources.token_table import read_token_sequences

    original = read_token_sequences(spark, dataset_dir).select(
        "doc_id", F.col("tokens").alias("tokens_in"))
    joined = classified.select("doc_id", "tokens").join(original, "doc_id")
    n_bad = joined.filter(F.col("tokens") != F.col("tokens_in")).count()
    assert n_bad == 0
    assert joined.count() == original.count()


def test_discard_summary_matches_truth(classified, truth):
    """Reference keeps separate .discarded / .unknownua review counts
    (webAccessLogParser.sh:646-653,680-683): each subtype must be
    separately reportable from the single unmatched sink."""
    from log_parser_spark.operators.aggregates import discard_summary

    access = parsed_family(classified, "access").filter(F.col("category") == "access")
    got = {r["reason"]: r["cnt"]
           for r in discard_summary(classified, access).collect()}

    t = truth
    unm = t[t.category == "unmatched"]
    exp = {
        "garbage": int((unm.family == "garbage").sum()),
        "parse_miss": int(((unm.family == "access") & unm.a_broken.eq(True)).sum()),
        "curl": int(((unm.family == "access") & ~unm.a_broken.eq(True)
                     & (unm.a_browser == "curl")).sum()),
        "no_uid": int(((unm.family == "access") & ~unm.a_broken.eq(True)
                       & (unm.a_browser != "curl")).sum()),
        "unknownua": int(((t.category == "access")
                          & (t.a_browser == "Other")).sum()),
    }
    exp = {k: v for k, v in exp.items() if v > 0}
    assert got == exp, (got, exp)
