"""Physical-plan assertions: the optimizations we claim must show up in the
plan, not just in docstrings (SURVEY.md §4).

Each check pins a Catalyst/Tungsten property that matters at 100 TB:
  - family/date predicates reach the parquet scan (PushedFilters),
  - reports read only their columns off the wide silver table (ReadSchema),
  - dimension joins broadcast (BroadcastHashJoin, no shuffle of the fact),
  - top-K compiles to TakeOrderedAndProject (no full sort materialization),
  - scan-side partition pruning on the hive `source` key prunes directories.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def sinks(spark, dataset_dir, tmp_path_factory):
    from log_parser_spark.plans.pipeline import run_pipeline
    from log_parser_spark.sources.atomic import AtomicTable

    out = tmp_path_factory.mktemp("plan_out")
    run_pipeline(spark, dataset_dir, out)
    return AtomicTable(out / "sinks").read(spark)


def test_family_filter_pushed_to_scan(sinks):
    from log_parser_spark.operators.parse import parsed_family

    gc = parsed_family(sinks, "gc")
    plan = _plan(gc)
    assert "PushedFilters" in plan
    assert "EqualTo(family,gc)" in plan.replace(" ", "").replace("'", "") or \
        "family" in plan.split("PushedFilters")[1][:200]


def test_report_reads_only_needed_columns(sinks):
    from log_parser_spark.operators.parse import parsed_family

    access = parsed_family(sinks, "access").filter(F.col("category") == "access")
    agg = access.groupBy("status").count()
    plan = _plan(agg)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    # the wide silver table has ~90 columns; this report must NOT read w_/g_ fields
    assert "w_evt" not in read_schema
    assert "g_gc_type" not in read_schema
    assert "line" not in read_schema


def test_enrich_join_broadcasts(spark, dataset_dir):
    from log_parser_spark.operators.enrich import enrich_route_meta
    from log_parser_spark.sources.token_table import read_all_lookups, read_token_sequences

    tokens = read_token_sequences(spark, dataset_dir)
    meta = read_all_lookups(spark, dataset_dir)["route_meta"]
    plan = _plan(enrich_route_meta(tokens, meta))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_is_take_ordered(spark, dataset_dir, sinks):
    from log_parser_spark.operators.parse import parsed_family
    from log_parser_spark.operators.topn import top_slowest_requests

    access = parsed_family(sinks, "access").filter(F.col("category") == "access")
    plan = _plan(top_slowest_requests(access))
    assert "TakeOrderedAndProject" in plan


def test_source_partition_pruning(spark, dataset_dir):
    from log_parser_spark.sources.token_table import read_token_sequences

    pruned = read_token_sequences(spark, dataset_dir, sources=["webhost010"])
    plan = _plan(pruned.groupBy("source").count())
    # hive partition filter appears as a PartitionFilters entry on the scan
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1][:200]
    assert "source" in seg


def test_hash_split_is_shuffle_free_projection(spark):
    """Split assignment must stay a pure per-row expression: no Exchange,
    no Python UDF crossing — at 100 TB it rides along any scan for free."""
    from log_parser_spark.operators import sampling as SA

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(SA.hash_split(docs).select("doc_id", "split"))
    assert "Exchange" not in plan
    assert "Python" not in plan  # no UDF: conv/md5 are JVM expressions


def test_pack_chunks_single_exchange_on_stream_key(spark):
    """Packing shuffles ONCE on the stream key for its window; stream keys
    are the parallelism unit, so exactly one hashpartitioning(source)."""
    from log_parser_spark.operators import sampling as SA

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(SA.pack_chunks(docs, max_len=1024))
    assert plan.count("hashpartitioning(") == 1
    assert "hashpartitioning(source" in plan


def test_pair_operators_have_no_terminal_sort(spark):
    """Scale-path pair producers must NOT end in a global sort: a terminal
    orderBy adds a rangepartitioning Exchange over the full pair set, which
    at 100 TB is a pure-waste shuffle (callers that want display order sort
    the final small result themselves). Asserted per VERDICT r3 ask #4."""
    from log_parser_spark.operators import dedup as D
    from log_parser_spark.operators import similarity as S

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    for df in (
        D.minhash_lsh_pairs(docs, threshold=0.5),
        D.simhash_near_dups(docs, max_hamming=8),
        D.ngram_jaccard_pairs(docs, n=3, threshold=0.5),
        D.exact_dedup(docs),
        D.decontaminate(docs.filter(F.col("doc_id") % 10 != 7),
                        docs.filter(F.col("doc_id") % 10 == 7),
                        n=3, mode="report"),
        S.near_dup_pairs_lsh(emb, threshold=0.4, dim=64),
        S.near_dup_pairs(emb, threshold=0.9),
    ):
        plan = _plan(df)
        assert "rangepartitioning" not in plan, plan[:2000]
