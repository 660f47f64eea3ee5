"""S3 — compressed-source decode (SURVEY.md §2.1).

The reference shells out per extension (`.zip` → `unzip -p`, `.gz` →
`gunzip -c`, `.log` → `cat`; websphereLogParser.sh:107-114). Spark-first,
decompression is the reader codec layer: parquet pages carry their codec
per column chunk (snappy/gzip/zstd read transparently, mixed codecs in one
scan), and the text/json line readers decode `.gz` files by extension.
These tests pin that transparency — identical results from identical data
regardless of on-disk codec — which SURVEY marked implemented-but-untested.
"""

from __future__ import annotations

import gzip
from pathlib import Path

import pytest
from pyspark.sql import functions as F


def _counts(df):
    return {
        r["category"]: r["cnt"]
        for r in df.groupBy("category").agg(F.count("*").alias("cnt")).collect()
    }


@pytest.fixture(scope="module")
def baseline(spark, dataset_dir):
    from log_parser_spark.operators.parse import fused_parse
    from log_parser_spark.sources.token_table import read_token_sequences

    tok = read_token_sequences(spark, dataset_dir)
    return _counts(fused_parse(tok)), tok


@pytest.mark.parametrize("codec", ["gzip", "zstd"])
def test_parquet_codec_transparent(spark, baseline, tmp_path_factory, codec):
    """Rewrite the token table under another parquet codec; the scan and
    the fused parse must be byte-identical in results — no reader changes,
    no codec hints at read time."""
    from log_parser_spark.operators.parse import fused_parse

    expected, tok = baseline
    out = str(tmp_path_factory.mktemp(f"tok_{codec}"))
    tok.write.option("compression", codec).mode("overwrite").parquet(out)
    again = spark.read.parquet(out)
    assert _counts(fused_parse(again)) == expected
    assert again.count() == tok.count()


def test_mixed_codecs_one_scan(spark, baseline, tmp_path_factory):
    """One directory, files written under different codecs — a single scan
    reads all of them (the codec lives in each column chunk's metadata).
    Mirrors a real lake where recompaction changes codecs over time."""
    expected, tok = baseline
    out = Path(str(tmp_path_factory.mktemp("tok_mixed")))
    half = tok.limit(tok.count() // 2)
    rest = tok.subtract(half)
    half.write.option("compression", "gzip").parquet(str(out / "a"))
    rest.write.option("compression", "zstd").parquet(str(out / "b"))
    merged = spark.read.parquet(str(out / "a"), str(out / "b"))
    assert merged.count() == tok.count()


def test_gzipped_text_lines(spark, tmp_path_factory):
    """`.gz` text logs decode by extension in the line reader — the direct
    analogue of the reference's `gunzip -c | parser` path."""
    d = Path(str(tmp_path_factory.mktemp("gz_text")))
    lines = [f"line {i} payload" for i in range(500)]
    with gzip.open(d / "part-0.log.gz", "wt") as f:
        f.write("\n".join(lines) + "\n")
    # plain sibling file in the same directory: mixed compressed +
    # uncompressed inputs in one read, like a log dir mid-rotation
    (d / "part-1.log").write_text("\n".join(lines[:100]) + "\n")
    df = spark.read.text(str(d))
    assert df.count() == 600
    assert df.filter(F.col("value") == "line 0 payload").count() == 2
