"""Text-analysis operators for training-data pipelines over `documents`:

  - token counting (whitespace + BPE-ish regex)
  - quality scoring (length / punctuation / stopword ratios)
  - language ID (stopword n-gram heuristic)
  - document fingerprinting (polynomial rolling hash)

All pure column expressions (JVM/codegen — no UDFs), with exact DuckDB-SQL
oracle equivalents (same arithmetic, same rounding) in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny English stopword list for the heuristic (public common words)
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]

# BPE-ish token regex: word pieces, numbers, or single non-space symbols
BPE_RX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_stats(docs: DataFrame) -> DataFrame:
    """Whitespace token count + BPE-ish piece count + char count."""
    words = F.split(F.col("text"), r"\s+")
    return docs.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RX), 0)).alias("n_bpeish"),
        F.length("text").alias("n_chars_calc"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Length/stopword/punct heuristic quality in [0,1] (rounded, oracle-stable)."""
    words = F.split(F.col("text"), r"\s+")
    n_words = F.size(words)
    stop_hits = F.size(F.filter(words, lambda w: w.isin(STOPWORDS)))
    n_punct = F.length(F.regexp_replace(F.col("text"), r"[^\.,;:!?]", ""))
    avg_word_len = F.length(F.regexp_replace(F.col("text"), r"\s+", "")) / n_words
    stop_ratio = stop_hits / n_words
    punct_ratio = n_punct / F.length("text")
    score = (
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
        + (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0))) * 0.2
        + F.when((avg_word_len >= 3) & (avg_word_len <= 10), 0.1).otherwise(0.0)
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-ratio language heuristic: >=5% English stopwords -> 'en'."""
    words = F.split(F.lower(F.col("text")), r"\s+")
    ratio = F.size(F.filter(words, lambda w: w.isin(STOPWORDS))) / F.size(words)
    return docs.select(
        "doc_id",
        F.when(ratio >= 0.05, "en").otherwise("unknown").alias("lang_pred"),
        F.round(ratio, 6).alias("stopword_ratio"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Polynomial rolling hash of the text (mod 2^61-1-ish prime), computed
    with F.aggregate over the char codepoints — deterministic, engine-portable
    (same arithmetic reproduces in DuckDB list_reduce)."""
    chars = F.split(F.col("text"), "")
    h = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % F.lit(1_000_000_007).cast("long"),
    )
    return docs.select("doc_id", h.alias("fingerprint"))
