"""Property-based tests (SURVEY.md §5.3): invariants that must hold for ANY
input, driven by hypothesis — counts conservation, bucket boundaries,
pct-sums, min<=avg<=max, line<->tokens bijection.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------- kernels
# (pure pandas kernels — property-test them directly, no Spark session cost)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.floats(min_value=0.0, max_value=100.0,
                          allow_nan=False), max_size=40))
def test_bucket_labels_partition_the_line(rts):
    """Every rt lands in exactly one of the 5 ranges; boundaries inclusive
    per webAccessLogParser.sh:465-481 (<=1, <=5, <=10, <=20, >20)."""
    from log_parser_spark.functions.buckets import RANGE_LABELS, bucket_py

    for rt in rts:
        label = bucket_py(rt)
        assert label in RANGE_LABELS
    assert bucket_py(1.0) == RANGE_LABELS[0]
    assert bucket_py(1.000001) == RANGE_LABELS[1]
    assert bucket_py(5.0) == RANGE_LABELS[1]
    assert bucket_py(20.0) == RANGE_LABELS[3]
    assert bucket_py(20.000001) == RANGE_LABELS[4]


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=120,
), max_size=30))
def test_line_tokens_bijection(lines):
    """tokens->line->tokens and line->tokens->line round-trip exactly
    (the sink line-view invariant, functions/detokenize)."""
    from log_parser_spark.functions.detokenize import (
        _retokenize_batch,
        series_of_token_lists_to_strings,
        tokenize_strings,
    )

    s = pd.Series(lines, dtype=object)
    toks = tokenize_strings(s)
    back = series_of_token_lists_to_strings(toks)
    assert back.fillna("").tolist() == s.fillna("").tolist()
    toks2 = _retokenize_batch(back)
    assert [list(t) if t is not None else None for t in toks2] == toks.tolist()


@settings(max_examples=20, deadline=None)
@given(st.lists(st.sampled_from([
    "alpha beta gamma", "alpha beta", "the quick brown fox", "", "solo",
]), min_size=0, max_size=25))
def test_simhash_deterministic_and_identity(texts):
    """Same text -> same simhash within and across batches."""
    from log_parser_spark.operators.dedup import _simhash_kernel

    s = pd.Series(texts, dtype=object)
    h1 = _simhash_kernel(s)
    h2 = _simhash_kernel(s)
    assert h1.tolist() == h2.tolist()
    by_text: dict[str, int] = {}
    for t, h in zip(texts, h1.tolist()):
        assert by_text.setdefault(t, h) == h


@settings(max_examples=25, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=80,
)), min_size=0, max_size=25))
def test_simhash_kernel_matches_naive_reference(texts):
    """The batched factorize/reduceat kernel equals a naive per-doc
    bit-vote (same md5-low-half word hash), incl. None/empty docs —
    guards the round-4 C-speed tokenize rewrite bit-for-bit."""
    import hashlib

    from log_parser_spark.operators.dedup import _simhash_kernel

    def ref(t: str | None) -> int:
        votes = [0] * 64
        for w in (t or "").split():
            h = int.from_bytes(hashlib.md5(w.encode()).digest()[8:16], "little")
            for k in range(64):
                votes[k] += 1 if (h >> k) & 1 else -1
        out = 0
        for k in range(64):
            if votes[k] > 0:
                out |= 1 << k
        return out - (1 << 64) if out >= (1 << 63) else out

    s = pd.Series(texts, dtype=object)
    assert _simhash_kernel(s).tolist() == [ref(t) for t in texts]


@settings(max_examples=20, deadline=None)
@given(st.lists(st.sampled_from([
    "a b c d e f", "a b c d e g", "x y z w v u", "a b c",
]), min_size=1, max_size=20))
def test_minhash_signature_stability(texts):
    """Signatures are batch-composition-independent (vocab factorization
    must not leak into values) and monotone under self-similarity."""
    from log_parser_spark.operators.dedup import _minhash_kernel

    s = pd.Series(texts, dtype=object)
    full = _minhash_kernel(s, n=3, num_perm=16, seed=7)
    for i in range(len(texts)):
        solo = _minhash_kernel(s.iloc[[i]], n=3, num_perm=16, seed=7)
        assert list(solo.iloc[0]) == list(full.iloc[i])


# ------------------------------------------------------- frame invariants

def test_counts_conservation(classified, truth):
    """rows_in == matched + discarded/unmatched (A25/north rule) on the
    deterministic dataset."""
    got = classified.groupBy("category").count().toPandas()
    assert got["count"].sum() == len(truth)


def test_pct_sums_and_min_avg_max(spark, classified, truth):
    from pyspark.sql import functions as F

    from log_parser_spark.operators import aggregates as A
    from log_parser_spark.operators.parse import parsed_family

    access = parsed_family(classified, "access").filter(F.col("category") == "access")
    uri = A.uri_stats(access).toPandas()
    ok = uri[uri["cnt"] > 0]
    assert (ok["min_rt"] <= ok["art"] + 1e-9).all()
    assert (ok["art"] <= ok["max_rt"] + 1e-9).all()

    sc = A.status_counts(access).toPandas()
    assert abs(sc["pct"].sum() - 100.0) < 0.5  # rounding per row


def test_incremental_read_since(spark, tmp_path):
    """S5: read_since(txid) returns exactly the later snapshots."""
    import pandas as pd

    from log_parser_spark.sources.atomic import AtomicTable

    at = AtomicTable(tmp_path / "t")
    df1 = spark.createDataFrame(pd.DataFrame({"x": [1, 2]}))
    df2 = spark.createDataFrame(pd.DataFrame({"x": [3]}))
    at.commit(df1, "t1")
    mark = at.last_txid()
    at.commit(df2, "t2")
    inc = at.read_since(spark, mark)
    assert sorted(r["x"] for r in inc.collect()) == [3]
    assert at.read_since(spark, "t2") is None
    assert sorted(r["x"] for r in at.read_since(spark, None).collect()) == [1, 2, 3]
