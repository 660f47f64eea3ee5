"""Deduplication operators for training-data pipelines over `documents`:

  exact         hash/groupBy on full text           (SQL-checkable)
  ngram-jaccard n-gram set overlap on candidate pairs (SQL-checkable)
  minhash+LSH   shingle -> minhash -> band buckets  (verified vs py oracle)
  simhash       bit-vote over token hashes          (verified by properties)
  embedding     cosine near-dup pairs               (see similarity.py)

Scale notes (100 TB): exact dedup is one hash aggregate (shuffle on a 64-bit
text hash, not the text). MinHash/LSH is the linear-scale path: signatures are
computed per-row (no shuffle), candidate generation shuffles only
(band_id, band_sig) pairs, and verification joins only within buckets —
never an all-pairs product. The all-pairs n-gram variant exists for oracle
parity at test scale and is guarded by a candidate join on shared n-grams.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: keeper = min doc_id, n_dups per distinct text.

    groupBy on xxhash64(text) + text (hash first keeps shuffle rows narrow
    at scale; text kept to rule out collisions)."""
    return (
        docs.groupBy(F.xxhash64(text_col).alias("text_hash"), F.col(text_col))
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n_dups"))
        .select("keeper", "n_dups")
        .orderBy("keeper")
    )


def char_ngrams(col, n: int = 3):
    """Array of character n-grams via slicing — pure column expressions."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(col) - (n - 1), F.lit(1))),
        lambda i: col.substr(i, F.lit(n)),
    )


def word_ngrams(col, n: int = 3):
    words = F.split(col, r"\s+")
    k = F.size(words)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(k - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.5) -> DataFrame:
    """Near-dup pairs by word-n-gram Jaccard >= threshold.

    Candidate generation via inverted index (explode distinct n-grams,
    self-join on n-gram) so only docs sharing at least one n-gram are
    compared — the all-pairs product never materializes.
    """
    grams = docs.select(
        "doc_id",
        F.array_distinct(word_ngrams(F.col("text"), n)).alias("grams"),
    ).withColumn("n_grams", F.size("grams"))

    inv = grams.select("doc_id", "n_grams", F.explode("grams").alias("g"))
    a = inv.select(F.col("doc_id").alias("id_a"), F.col("n_grams").alias("na"), "g")
    b = inv.select(F.col("doc_id").alias("id_b"), F.col("n_grams").alias("nb"), "g")
    common = (
        a.join(b, "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count("*").alias("common"))
    )
    jac = common.withColumn(
        "jaccard",
        F.round(F.col("common") / (F.col("na") + F.col("nb") - F.col("common")), 6),
    )
    return jac.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------- MinHash/LSH

def _minhash_params(num_perm: int, seed: int = 7) -> tuple[list[int], list[int]]:
    rng = np.random.RandomState(seed)
    p = (1 << 31) - 1
    a = rng.randint(1, p, size=num_perm).tolist()
    b = rng.randint(0, p, size=num_perm).tolist()
    return a, b


MERSENNE = (1 << 31) - 1


def minhash_signatures(docs: DataFrame, n: int = 3, num_perm: int = 16, seed: int = 7) -> DataFrame:
    """Per-doc MinHash signature over word n-grams.

    Base gram hash = xxhash64 (JVM); permutations h_i(x) = (a_i*x+b_i) mod p
    folded with aggregate(min) per row — zero shuffle for signatures.
    """
    a, b = _minhash_params(num_perm, seed)
    grams = F.array_distinct(word_ngrams(F.col("text"), n))
    hashes = F.transform(grams, lambda g: F.pmod(F.xxhash64(g), F.lit(MERSENNE)))

    def perm(ai: int, bi: int):
        return lambda h: F.pmod(h * F.lit(ai) + F.lit(bi), F.lit(MERSENNE))

    sig = F.array(
        *[F.array_min(F.transform(hashes, perm(ai, bi))) for ai, bi in zip(a, b)]
    )
    return docs.select("doc_id", sig.alias("minhash"))


def minhash_lsh_pairs(
    docs: DataFrame, n: int = 3, num_perm: int = 16, bands: int = 4,
    threshold: float = 0.5, seed: int = 7,
) -> DataFrame:
    """LSH candidate pairs -> exact Jaccard verification on candidates only.

    bands x rows signature split; docs colliding in ANY band become
    candidates. Shuffle volume = num_docs * bands tiny rows.
    """
    rows = num_perm // bands
    sigs = minhash_signatures(docs, n, num_perm, seed)
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.slice("minhash", i * rows + 1, rows).cast("array<string>").alias("sig"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", F.col("bs.band").alias("band"), F.concat_ws(",", "bs.sig").alias("sig"))

    a = banded.select(F.col("doc_id").alias("id_a"), "band", "sig")
    b = banded.select(F.col("doc_id").alias("id_b"), "band", "sig")
    cands = (
        a.join(b, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    grams = docs.select(
        "doc_id", F.array_distinct(word_ngrams(F.col("text"), n)).alias("grams")
    )
    ga = grams.select(F.col("doc_id").alias("id_a"), F.col("grams").alias("ga"))
    gb = grams.select(F.col("doc_id").alias("id_b"), F.col("grams").alias("gb"))
    verified = (
        cands.join(ga, "id_a").join(gb, "id_b")
        .withColumn("common", F.size(F.array_intersect("ga", "gb")))
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.size("ga") + F.size("gb") - F.col("common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified.orderBy("id_a", "id_b")


# ------------------------------------------------------------------ SimHash

def simhash(docs: DataFrame) -> DataFrame:
    """64-bit SimHash: per-word xxhash64, bit-vote, sign -> bit.

    Expressed as a per-row fold (aggregate over the word array accumulating
    64 counters via the hash's 64-char two's-complement bit string) — no
    explode, no shuffle, whole-stage-codegen friendly.
    """
    words = F.split(F.col("text"), r"\s+")
    hashes = F.transform(words, lambda w: F.xxhash64(w))

    def bits_of(h):
        bstr = F.lpad(F.bin(h), 64, "0")  # MSB-first; negatives already 64 chars
        return F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: F.when(bstr.substr(i, F.lit(1)) == "1", 1).otherwise(-1),
        )

    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(acc, bits_of(h), lambda x, y: x + y),
    )
    # reassemble MSB-first: votes[1] is bit 63 (sign bit -> long.min literal)
    terms = [
        F.when(F.element_at(votes, 1) > 0, F.lit(-(1 << 63)).cast("long")).otherwise(F.lit(0).cast("long"))
    ] + [
        F.when(F.element_at(votes, 64 - i) > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        for i in range(62, -1, -1)
    ]
    sh = terms[0]
    for t in terms[1:]:
        sh = sh.bitwiseOR(t)
    return docs.select("doc_id", sh.alias("simhash"))


def hamming64(a, b):
    """Hamming distance between two 64-bit longs (popcount of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dups(docs: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, bucketed by the top-16
    bits so candidate joins stay local (scale path: multi-table bit-block
    indexing a la public SimHash dedup pipelines)."""
    sh = simhash(docs).withColumn("block", F.shiftright(F.col("simhash"), 48))
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh_a"), "block")
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sh_b"), "block")
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", hamming64(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    )
