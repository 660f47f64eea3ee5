"""Dataset-assembly operators for training pipelines over `documents`:

  - deterministic hash split (train/val/test) and hash sampling — the
    reproducible way to carve held-out sets from a 100 TB corpus: no
    global sort, no state, membership decided per-row by a salted hash
    of the stable document key, so re-runs (and incremental appends)
    land every doc in the same split;
  - sequence packing (concat-then-chunk): the standard pretraining
    layout — token streams are concatenated per stream key and split at
    fixed max_len boundaries; this operator computes each document's
    chunk span from a windowed running offset.

All pure column expressions (JVM/codegen — no UDFs, no shuffles beyond
the packing window's per-key sort). The hash is the md5 low half, which
equals DuckDB's ``md5_number_lower`` — so split membership, sample
membership and chunk spans all replay exactly as SQL oracles (the same
trick `operators/dedup._hash64_uniques` uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: bucket space for split/sample rates — rates quantize to 1/10000
HASH_BUCKETS = 10_000


def hash_bucket(key_col, salt: str = "v1"):
    """Deterministic bucket in [0, HASH_BUCKETS) from a salted md5.

    Matches DuckDB ``md5_number_lower(key || ':' || salt) % 10000``: the
    low 8 digest bytes read little-endian — built here by reversing the
    lower-half hex pairs and converting base 16. conv() yields the
    unsigned decimal string; DECIMAL(20,0) holds all 64 bits.
    """
    h = F.md5(F.concat_ws(":", key_col.cast("string"), F.lit(salt)))
    le_hex = F.concat(*[F.substring(h, p, 2) for p in range(31, 15, -2)])
    return (
        F.conv(le_hex, 16, 10).cast("decimal(20,0)") % HASH_BUCKETS
    ).cast("int")


def hash_split(
    docs: DataFrame, key: str = "doc_id", salt: str = "v1",
    val_pct: float = 1.0, test_pct: float = 1.0,
) -> DataFrame:
    """Assign every row a reproducible train/val/test split.

    Percentages quantize to 0.01%. Appending new data later cannot move an
    existing doc between splits, and sharded/parallel runs agree without
    coordination — the properties a long-lived training corpus needs.
    """
    val_b = int(round(val_pct / 100 * HASH_BUCKETS))
    test_b = int(round(test_pct / 100 * HASH_BUCKETS))
    b = hash_bucket(F.col(key), salt)
    return docs.withColumn(
        "split",
        F.when(b < val_b, F.lit("val"))
        .when(b < val_b + test_b, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def hash_sample(
    docs: DataFrame, rate_pct: float, key: str = "doc_id", salt: str = "v1",
) -> DataFrame:
    """Deterministic ~rate_pct% sample: keep rows whose bucket falls under
    the rate. Unlike df.sample(), membership is a pure function of the key,
    so the sample is stable across runs, partitionings and appends."""
    keep = int(round(rate_pct / 100 * HASH_BUCKETS))
    return docs.filter(hash_bucket(F.col(key), salt) < keep)


def pack_chunks(
    docs: DataFrame, max_len: int, stream_key: str = "source",
    order_key: str = "doc_id", tok_col=None,
) -> DataFrame:
    """Concat-then-chunk sequence packing map (per-doc chunk spans).

    Documents are laid out per stream key in order_key order as one
    contiguous token stream, then cut at fixed ``max_len`` boundaries (the
    standard pretraining packing — documents may straddle chunk borders).
    Returns, per doc: its running token ``offset`` in the stream, the
    ``chunk_start``/``chunk_end`` it lands in, and its in-chunk position.

    Scale shape: one window per stream key (shuffle on the key, sort
    within). Stream keys are the parallelism unit — at 100 TB the key is
    (source, date-shard) so no single stream's sort dominates; the chunk
    materialization downstream is then an embarrassingly parallel
    groupBy(chunk).
    """
    n_tok = tok_col if tok_col is not None else F.size(F.split(F.col("text"), r"\s+"))
    w = (
        Window.partitionBy(stream_key)
        .orderBy(order_key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum(n_tok).over(w), F.lit(0)).cast("bigint")
    staged = docs.select(
        F.col(order_key),
        F.col(stream_key),
        n_tok.cast("bigint").alias("n_tok"),
        offset.alias("offset"),
    )
    # integer DIV, not floor(double /): offsets stay exact past 2^53 tokens
    return staged.select(
        order_key, stream_key, "n_tok", "offset",
        F.expr(f"offset DIV {max_len}").alias("chunk_start"),
        F.expr(f"(offset + n_tok - 1) DIV {max_len}").alias("chunk_end"),
        (F.col("offset") % max_len).alias("offset_in_chunk"),
    )
