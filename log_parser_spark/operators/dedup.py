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

import hashlib
import logging
import warnings

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _hash64_uniques(strings) -> np.ndarray:
    """Deterministic 64-bit hash per unique string (md5 low half,
    platform-stable).

    Called on the FACTORIZED vocabulary only — corpora repeat tokens/grams
    heavily, so this per-unique Python loop is O(vocab), not O(corpus).

    The exact definition — little-endian int of md5 bytes 8..16 — equals
    DuckDB's ``md5_number_lower``, which makes every MinHash/SimHash
    signature (and therefore the LSH pair sets built from them) replayable
    as plain SQL by the DuckDB correctness oracle."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")
            for s in strings
        ),
        dtype=np.uint64,
        count=len(strings),
    )


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: keeper = min doc_id, n_dups per distinct text.

    groupBy on xxhash64(text) + text (hash first keeps shuffle rows narrow
    at scale; text kept to rule out collisions)."""
    return (
        docs.groupBy(F.xxhash64(text_col).alias("text_hash"), F.col(text_col))
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n_dups"))
        .select("keeper", "n_dups")
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


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs by word-n-gram Jaccard >= threshold.

    Candidate generation via inverted index (explode distinct n-grams,
    self-join on n-gram) so only docs sharing at least one n-gram are
    compared — the all-pairs product never materializes. Verification
    computes the EXACT Jaccard from the full gram arrays, so candidate
    pruning never perturbs a surviving pair's score.

    ``max_df`` is the 100-TB guard: grams appearing in more than ``max_df``
    docs (boilerplate / stopword runs) are dropped from the INDEX ONLY —
    without it one hot gram makes the candidate self-join quadratic on its
    posting list. Pairs that share only hot grams are missed (by design;
    route such corpora through MinHash-LSH); every pair sharing >=1 rare
    gram is still scored exactly.
    """
    grams = docs.select(
        "doc_id",
        F.array_distinct(word_ngrams(F.col("text"), n)).alias("grams"),
    ).withColumn("n_grams", F.size("grams"))
    inv = grams.select("doc_id", "n_grams", F.explode("grams").alias("g"))

    if max_df is None:
        # fast path: the index join COUNTS shared grams directly — with an
        # uncapped index the count IS the exact intersection size, so no
        # second join against the gram arrays is needed
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
        )

    # capped path: hot grams leave the index, so the index count is only a
    # lower bound — candidates verify EXACTLY against the full gram arrays
    keep = inv.groupBy("g").agg(F.count("*").alias("df")).filter(
        F.col("df") <= max_df).select("g")
    capped = inv.join(keep, "g")
    a = capped.select(F.col("doc_id").alias("id_a"), "g")
    b = capped.select(F.col("doc_id").alias("id_b"), "g")
    cands = (
        a.join(b, "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    ga = grams.select(F.col("doc_id").alias("id_a"), F.col("grams").alias("ga"))
    gb = grams.select(F.col("doc_id").alias("id_b"), F.col("grams").alias("gb"))
    return (
        cands.join(ga, "id_a").join(gb, "id_b")
        .withColumn("common", F.size(F.array_intersect("ga", "gb")))
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.size("ga") + F.size("gb") - F.col("common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    bench_text_col: str | None = None,
    mode: str = "drop",
) -> DataFrame:
    """Benchmark decontamination: remove training documents containing ANY
    word n-gram that occurs in an evaluation set — the GPT-3 appendix-C /
    PaLM overlap rule (13-grams in the papers; ``n`` parameterized, tests
    use 3). Beyond-reference training-data op; no log-parser analogue.

    Spark shape for 100 TB: the benchmark's distinct n-gram set is tiny
    next to the corpus, so it BROADCASTS; training docs explode their
    distinct n-grams once and probe the broadcast hash map map-side — the
    corpus itself is never shuffled for the membership test, and the only
    aggregation is per-doc over its own grams (partial/map-side combine).

    mode: ``drop`` -> the clean corpus (contaminated docs removed);
    ``mark`` -> full corpus + ``contaminated`` flag + hit-gram count;
    ``report`` -> (doc_id, contaminated_grams) for contaminated docs only.
    """
    bcol = bench_text_col or text_col
    bench_grams = (
        benchmark.select(
            F.explode(F.array_distinct(word_ngrams(F.col(bcol), n))).alias("g")
        ).distinct()
    )
    doc_grams = docs.select(
        "doc_id",
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("g"),
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("contaminated_grams"))
    )
    if mode == "report":
        return hits
    if mode == "mark":
        return (
            docs.join(hits, "doc_id", "left")
            .withColumn("contaminated", F.col("contaminated_grams").isNotNull())
            .withColumn(
                "contaminated_grams", F.coalesce("contaminated_grams", F.lit(0))
            )
        )
    if mode == "drop":
        return docs.join(hits.select("doc_id"), "doc_id", "left_anti")
    raise ValueError(f"unknown mode {mode!r} (drop|mark|report)")


# ---------------------------------------------------------------- MinHash/LSH

def _minhash_params(num_perm: int, seed: int = 7) -> tuple[list[int], list[int]]:
    rng = np.random.RandomState(seed)
    p = (1 << 31) - 1
    a = rng.randint(1, p, size=num_perm).tolist()
    b = rng.randint(0, p, size=num_perm).tolist()
    return a, b


MERSENNE = (1 << 31) - 1


def _doc_word_ngrams_py(words: list[str], n: int) -> set[str]:
    """Same semantics as word_ngrams(): k<=n docs yield one truncated gram."""
    if len(words) <= n:
        return {" ".join(words[:n])}
    return {" ".join(words[i: i + n]) for i in range(len(words) - n + 1)}


def _minhash_kernel(text: pd.Series, n: int, num_perm: int, seed: int) -> pd.Series:
    """Arrow-batched signature kernel: factorize grams across the batch,
    hash the vocabulary once, evaluate all permutations as one (P,U) numpy
    matrix, segment-min per doc via minimum.reduceat — O(batch grams)."""
    a, b = _minhash_params(num_perm, seed)
    A = np.array(a, dtype=np.uint64)[:, None]
    B = np.array(b, dtype=np.uint64)[:, None]

    vocab: dict[str, int] = {}
    gram_idx: list[int] = []
    starts: list[int] = []
    for t in text.fillna(""):
        starts.append(len(gram_idx))
        for g in _doc_word_ngrams_py(t.split(), n):
            gram_idx.append(vocab.setdefault(g, len(vocab)))
    if not vocab:
        return pd.Series([[0] * num_perm] * len(text), index=text.index, dtype=object)

    h = _hash64_uniques(list(vocab)) % np.uint64(MERSENNE)
    perms = (A * h[None, :] + B) % np.uint64(MERSENNE)         # (P, U)
    M = perms[:, np.array(gram_idx, dtype=np.int64)]           # (P, G)
    mins = np.minimum.reduceat(M, np.array(starts, dtype=np.int64), axis=1)  # (P, D)
    out = mins.T.astype(np.int64)
    return pd.Series(list(out), index=text.index, dtype=object)


def minhash_signatures(docs: DataFrame, n: int = 3, num_perm: int = 16, seed: int = 7) -> DataFrame:
    """Per-doc MinHash signature over word n-grams.

    Vectorized Arrow kernel (no shuffle): grams are factorized per batch so
    each unique gram is hashed once; permutations h_i(x) = (a_i*x+b_i) mod p
    evaluate as a single numpy matrix; per-doc minima via segment-reduce.
    """

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig_udf(text: pd.Series) -> pd.Series:
        return _minhash_kernel(text, n, num_perm, seed)

    return docs.select("doc_id", sig_udf("text").alias("minhash"))


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
    return verified


# ------------------------------------------------------------------ SimHash

def _simhash_kernel(text: pd.Series) -> pd.Series:
    """Arrow-batched SimHash: factorize words, hash the vocabulary once,
    bit-vote with one segment-reduce over the whole batch — O(batch words).

    Tokenize/factorize run at C speed (``chain.from_iterable`` +
    ``pd.factorize``'s hash table); the only Python-level loop left is the
    O(vocab) md5 in `_hash64_uniques`. The word->hash mapping is unchanged,
    so signatures stay bit-identical to the DuckDB SQL replay oracle."""
    from itertools import chain

    toks = text.fillna("").str.split()
    n_docs = len(text)
    counts = toks.map(len).to_numpy(dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        return pd.Series([0] * n_docs, index=text.index, dtype="int64")
    flat = np.fromiter(chain.from_iterable(toks), dtype=object, count=total)
    codes, uniques = pd.factorize(flat)

    h = _hash64_uniques(uniques)                                # (U,)
    shifts = np.arange(64, dtype=np.uint64)
    bits = (((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int32) * 2 - 1)  # (U,64)
    G = bits[codes]                                             # (W,64)
    # empty docs are zero-width segments; reduceat over the NONEMPTY starts
    # sums each doc's contiguous word rows exactly (zero-width neighbors
    # don't shift boundaries), empty docs keep all-zero votes
    starts_a = np.concatenate(([0], np.cumsum(counts)[:-1]))
    empty = counts == 0
    votes = np.zeros((n_docs, 64), dtype=np.int64)
    if (~empty).any():
        votes[~empty] = np.add.reduceat(G, starts_a[~empty], axis=0)
    packed = (votes > 0).astype(np.uint64)
    sh = np.zeros(n_docs, dtype=np.uint64)
    for k in range(64):
        sh |= packed[:, k] << np.uint64(k)
    return pd.Series(sh.astype(np.int64), index=text.index)


def simhash(docs: DataFrame, keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """64-bit SimHash: per-word 64-bit hash, bit-vote, sign -> bit.

    Vectorized Arrow kernel: each unique word hashed once per batch, votes
    via numpy segment-reduce, bit-pack in 64 vector ops. (The reference has
    no such operator; this is the training-data near-dup path.)

    ``keep_cols`` are carried through unchanged (used by the partitioned
    near-dup path to keep its pre-partition key next to the signature)."""

    @F.pandas_udf(T.LongType())
    def sh_udf(text: pd.Series) -> pd.Series:
        return _simhash_kernel(text)

    return docs.select("doc_id", *keep_cols, sh_udf("text").alias("simhash"))


def hamming64(a, b):
    """Hamming distance between two 64-bit longs (popcount of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def _block_spec(n_bits: int, n_blocks: int) -> list[tuple[int, int]]:
    """(offset, width) per block, widths differing by at most 1."""
    base, rem = divmod(n_bits, n_blocks)
    widths = [base + 1] * rem + [base] * (n_blocks - rem)
    offs, acc = [], 0
    for w in widths:
        offs.append(acc)
        acc += w
    return list(zip(offs, widths))


_LOG = logging.getLogger(__name__)


def simhash_near_dups(
    docs: DataFrame,
    max_hamming: int = 8,
    expected_docs: int | None = None,
    partition_cols: tuple[str, ...] = (),
    max_expected_bucket: int = 50_000,
) -> DataFrame:
    """ALL pairs with SimHash hamming distance <= max_hamming, via pigeonhole
    multi-block indexing: the 64 bits split into ``max_hamming + 1`` blocks,
    so any pair within distance max_hamming agrees EXACTLY on at least one
    block (the classic Manku/Jarvelin scheme) — recall 1.0 by construction,
    never an all-pairs join. Candidate volume is bounded by the per-block
    bucket sizes; the hamming filter then verifies exactly.

    Sizing guard for 100 TB: max_hamming+1 blocks over 64 bits means ~7-bit
    blocks at max_hamming=8 — only 128 bucket values per table, so bucket
    sizes grow linearly with the corpus and the per-bucket self-join trends
    toward N^2/128. When the narrowest block is under 12 bits, this function
    enforces the documented mitigations instead of degrading silently:

    * pass ``expected_docs`` (approximate corpus size) — if the implied
      per-bucket population exceeds ``max_expected_bucket``, a
      ``RuntimeWarning`` spells out the two fixes (lower ``max_hamming``
      for wider blocks: max_hamming=3 -> 16-bit blocks; or pre-partition);
    * pass ``partition_cols`` — an exact pre-partition key (language,
      domain, shard...) joined alongside (blk, val), which bounds every
      bucket to one partition's population. Recall stays 1.0 *within* a
      partition; pairs straddling partition values are deliberately out of
      scope (pick a key near-dups share);
    * with neither, a log-level warning records that the candidate join is
      unsized.

    (The round-1 version bucketed on ONE 16-bit block and silently missed
    any pair whose differing bits touched bits 48-63.)"""
    n_blocks = max_hamming + 1
    min_width = 64 // n_blocks
    partition_cols = tuple(partition_cols)
    if not partition_cols and min_width < 12:
        n_buckets = 1 << min_width
        if expected_docs is not None and expected_docs / n_buckets > max_expected_bucket:
            warnings.warn(
                f"simhash_near_dups: max_hamming={max_hamming} -> {n_blocks} blocks of "
                f"as few as {min_width} bits ({n_buckets} bucket values per table); at "
                f"~{expected_docs:,} docs each bucket holds ~{expected_docs // n_buckets:,} "
                f"docs and the per-bucket self-join degenerates toward N^2/{n_buckets}. "
                "Lower max_hamming (3 -> 16-bit blocks) or pass partition_cols= with an "
                "exact pre-partition key (recall stays 1.0 within each partition).",
                RuntimeWarning,
                stacklevel=2,
            )
        elif expected_docs is None:
            _LOG.warning(
                "simhash_near_dups: narrowest block is %d bits (< 12); pass "
                "expected_docs= to size the candidate join or partition_cols= "
                "to bound bucket populations",
                min_width,
            )
    sh = simhash(docs, keep_cols=partition_cols)
    blocks = F.array(*[
        F.struct(
            F.lit(i).alias("blk"),
            F.shiftrightunsigned(F.col("simhash"), off)
            .bitwiseAND(F.lit((1 << width) - 1)).alias("val"),
        )
        for i, (off, width) in enumerate(_block_spec(64, n_blocks))
    ])
    pc = list(partition_cols)
    ex = sh.select("doc_id", *pc, "simhash", F.explode(blocks).alias("b")).select(
        "doc_id", *pc, "simhash",
        F.col("b.blk").alias("blk"), F.col("b.val").alias("val"))
    a = ex.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh_a"),
                  "blk", "val", *pc)
    b = ex.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sh_b"),
                  "blk", "val", *pc)
    return (
        a.join(b, ["blk", "val", *pc])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
        .withColumn("hamming", hamming64(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ----------------------------------------------------- near-dup clustering

def connected_components(pairs: DataFrame, max_iter: int = 15) -> DataFrame:
    """(id, comp): connected components of the near-dup pair graph via
    iterative min-label propagation — the step that turns PAIRS into
    dedup CLUSTERS (keep one doc per component).

    Each iteration does a neighbor-min (edge join + groupBy-min) followed
    by one pointer-doubling shortcut — label(id) := label(label(id)) — so
    labels converge in O(log diameter) rounds instead of O(diameter)
    (Shiloach-Vishkin-style pointer jumping; labels are node ids, so the
    shortcut is a self-join of the label table, and labels only ever
    decrease toward the component min). A 500-node chain converges in ~10
    rounds (see tests). The driver loop runs a handful of bounded Spark
    jobs — the documented iterative-algorithm pattern, not a
    collect()-based loop. Each round's label table is eagerly
    ``localCheckpoint``-ed: the doubling self-join would otherwise double
    the logical plan every round (exponential analysis/recompute), and
    checkpointing truncates lineage so per-round cost stays constant.

    If the loop exhausts ``max_iter`` with labels still changing (a
    component whose diameter exceeds the budget), a RuntimeError is raised
    rather than silently returning partial labels — partial labels would
    make ``dedup_keep_representatives`` keep several docs of one cluster
    (silent under-dedup). Raise the budget (diameter rounds, not data
    size) or pre-split giant components if this fires.

    The returned frame is a materialized local checkpoint; callers that
    don't hold onto it should ``.unpersist()`` it once their downstream
    plan has run.
    """
    e = pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    edges = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).persist()
    # no .persist() here: localCheckpoint materializes the frame itself,
    # and a persisted pre-checkpoint handle would be shadowed by the
    # reassignment below and leak one cached frame per call
    comp = (
        edges.select(F.col("u").alias("id")).distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nb = edges.join(comp, edges["v"] == comp["id"]).select(
            F.col("u").alias("id"), F.col("comp"))
        m = (
            comp.select("id", "comp").unionByName(nb)
            .groupBy("id").agg(F.min("comp").alias("c1"))
            .localCheckpoint()  # doubling self-joins m: compute it once
        )
        # pointer doubling: jump through the label's own label in the same
        # round — halves remaining chain depth, O(log diameter) total.
        lab = m.select(F.col("id").alias("lid"), F.col("c1").alias("lc"))
        upd = (
            m.join(lab, m["c1"] == lab["lid"], "left")
            .select(
                "id",
                F.least(F.col("c1"), F.coalesce(F.col("lc"), F.col("c1")))
                .alias("comp"),
            )
            .localCheckpoint()
        )
        changed = (
            comp.select("id", F.col("comp").alias("prev"))
            .join(upd, "id")
            .filter(F.col("prev") != F.col("comp"))
            .limit(1).count()
        )
        old, oldm = comp, m
        comp = upd
        old.unpersist()
        oldm.unpersist()
        if changed == 0:
            break
    else:
        edges.unpersist()
        comp.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(a component's diameter exceeds the budget); raise max_iter "
            "or pre-split the pair graph"
        )
    edges.unpersist()
    return comp


def dedup_keep_representatives(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
) -> DataFrame:
    """Drop every non-representative member of each near-dup cluster: the
    kept doc is the component's min id (matching exact_dedup's keeper
    convention). Docs not in any pair pass through untouched — one
    left_anti join against the (small) non-representative set."""
    comp = connected_components(pairs)
    # Materialize the (small) non-representative set so the big comp
    # frame can be released before the anti-join plan runs — the comp
    # cache would otherwise leak one DataFrame per call.
    losers = comp.filter(F.col("id") != F.col("comp")).select(
        F.col("id").alias(id_col)).persist()
    losers.count()
    comp.unpersist()
    return docs.join(losers, id_col, "left_anti")
