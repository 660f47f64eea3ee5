"""Routing stage: salted fan-out of one classified DataFrame to the four
category sinks (error, access, audit, unmatched) + per-partition lineage.

Reference: S7 single-pass multi-sink append (webAccessLogParser.sh:667,683,652)
— one AWK pass appends each record to exactly one report file. Spark-first
re-expression: ONE shuffle-free write with ``partitionBy("category")`` off a
single salted repartition, never four separate jobs over the same scan.

Skew: `source` is hot (one chatty host carries ~40% of rows — FIXTURES §1).
Category is even hotter (access ~70%). Repartitioning on
(category, salt(doc_id)) spreads each sink's rows over many tasks so no
single writer task owns an entire hot sink (SURVEY.md §4 'salted repartition
for sink fan-out skew'; aggregate keys are never salted — they're
key-complete hash aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SINKS = ["access", "error", "audit", "unmatched"]
# closed vocabulary of unmatched subtypes (operators/parse.classify)
DISCARD_REASONS = ["curl", "no_uid", "parse_miss", "garbage"]
# line is the 1-byte/char view of the token array (exact bijection — see
# functions/detokenize.retokenize_udf); n_tok preserved for accounting.
SINK_COLUMNS = ["doc_id", "line", "n_tok", "source", "family", "category",
                "discard_reason"]


def salted(df: DataFrame, num_partitions: int, *keys: str, salt_buckets: int = 64) -> DataFrame:
    """Repartition on (*keys, salt) — defuses single-hot-key writer skew."""
    salt = F.pmod(F.xxhash64("doc_id"), F.lit(salt_buckets))
    return df.repartition(num_partitions, *[F.col(k) for k in keys], salt)


def routed_for_write(classified: DataFrame, num_partitions: int = 32) -> DataFrame:
    """Project the sink schema and salt-repartition for the fan-out write."""
    return salted(classified.select(*SINK_COLUMNS), num_partitions, "category")


def with_scan_provenance(df: DataFrame) -> DataFrame:
    """Capture (partition_id, input_file) AT SCAN TIME — input_file_name()
    is undefined after a multi-source join, and scan-stage identity is the
    correct lineage grain anyway."""
    return df.withColumn("partition_id", F.spark_partition_id()).withColumn(
        "input_file", F.input_file_name()
    )


def lineage_frame(classified: DataFrame) -> DataFrame:
    """Per-partition lineage records (S10 / north rule).

    The reference logs per-file progress to parser.log (usage.sh:56);
    the rebuild records, per input partition: the files scanned, rows in,
    parse hit/miss, and per-sink routed counts. Requires the provenance
    columns added by ``with_scan_provenance`` before any join.
    """
    per_cat = (
        classified
        .groupBy("partition_id", "category")
        .agg(
            F.count("*").alias("rows"),
            F.collect_set("input_file").alias("files"),
            *[
                F.sum(F.when(F.col("discard_reason") == r, 1).otherwise(0))
                .alias(f"dr_{r}")
                for r in DISCARD_REASONS
            ],
        )
    )
    return (
        per_cat.groupBy("partition_id")
        .agg(
            F.array_distinct(F.flatten(F.collect_list("files"))).alias("input_files"),
            F.sum("rows").alias("rows_in"),
            F.sum(F.when(F.col("category") != "unmatched", F.col("rows")).otherwise(0)).alias("rows_matched"),
            F.sum(F.when(F.col("category") == "unmatched", F.col("rows")).otherwise(0)).alias("rows_unmatched"),
            F.map_from_entries(
                F.collect_list(F.struct(F.col("category"), F.col("rows")))
            ).alias("sink_counts"),
            # reference's .discarded vs parse-miss/garbage split, per
            # partition (webAccessLogParser.sh:680-683)
            F.map_from_arrays(
                F.array(*[F.lit(r) for r in DISCARD_REASONS]),
                F.array(*[F.sum(f"dr_{r}") for r in DISCARD_REASONS]),
            ).alias("discard_counts"),
        )
    )
