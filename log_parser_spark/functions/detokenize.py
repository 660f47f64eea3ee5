"""Vectorized detokenization: tokens array<int32> -> UTF-8 string.

Tokenization contract (FIXTURES.md §1): byte-level — each token is one UTF-8
byte (0..255) of the raw log line; detokenize = bytes(tokens).decode("utf-8").

The kernel must stay O(batch), never O(row) Python. Two implementations:

1. ``detokenize_udf`` — Arrow-batched pandas UDF. Uses pyarrow's flat
   list representation: one ``values.astype(uint8).tobytes()`` for the whole
   batch, then zero-copy slicing by offsets. This is the north-rule kernel
   ("vectorized pandas/Arrow UDF ... detokenized byte views", BASELINE.json).

2. ``detokenize_col`` — pure JVM column expression
   (transform + char + array_join): no Python at all, whole-stage-codegen
   friendly. Exact for ASCII payloads; kept as the fast path for cheap
   pre-parse classification where the full UDF machinery isn't needed.

Reference parity note: the reference consumes raw text lines directly
(e.g. webAccessLogParser.sh:153-157 `cat | awk`); detokenization is the
rebuild's scan-adjacent projection.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def series_of_token_lists_to_strings(tokens: pd.Series) -> pd.Series:
    """Batch-decode a pandas Series of int token lists into strings.

    O(batch): one numpy concatenation + one bytes() + offset slicing.
    Handles None rows (-> None).
    """
    arr = pa.array(tokens, type=pa.list_(pa.int32()))
    # flatten() drops nulls from values; offsets remain valid for slicing
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.uint8)
    buf = flat.tobytes()
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    validity = arr.is_valid().to_numpy(zero_copy_only=False)
    out = [
        buf[offsets[i]: offsets[i + 1]].decode("utf-8", errors="replace")
        if validity[i]
        else None
        for i in range(len(arr))
    ]
    return pd.Series(out, index=tokens.index, dtype=object)


@F.pandas_udf(T.StringType())
def detokenize_udf(tokens: pd.Series) -> pd.Series:
    """tokens array<int32> -> string, Arrow-batched (north-rule kernel)."""
    return series_of_token_lists_to_strings(tokens)


def detokenize_col(tokens: Column | str) -> Column:
    """JVM-only detokenize for ASCII payloads: char() per byte + join.

    Stays inside whole-stage codegen — no Python worker round-trip. Only
    exact for single-byte (ASCII) content; the generator emits ASCII.
    """
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    return F.array_join(F.transform(c, lambda x: F.char(x)), "")


def tokenize_strings(lines: pd.Series) -> pd.Series:
    """Inverse kernel for the generator/tests: string -> list of byte values."""
    return lines.map(lambda s: None if s is None else list(s.encode("utf-8")))


def _retokenize_batch(lines: pd.Series) -> pd.Series:
    """string -> array<int32> of UTF-8 bytes, O(batch) (numpy split, no
    per-row Python): exact inverse of ``series_of_token_lists_to_strings``."""
    notna = lines.notna()
    vals = lines[notna]
    joined = "".join(vals.tolist()).encode("utf-8")
    flat = np.frombuffer(joined, dtype=np.uint8).astype(np.int32)
    lens = vals.map(lambda s: len(s.encode("utf-8"))).to_numpy(dtype=np.int64)
    parts = np.split(flat, np.cumsum(lens)[:-1]) if len(vals) else []
    dense = pd.Series(parts, index=vals.index, dtype=object)
    return dense.reindex(lines.index)


@F.pandas_udf(T.ArrayType(T.IntegerType()))
def retokenize_udf(lines: pd.Series) -> pd.Series:
    """Reconstruct the token array from a sink's line column.

    Byte-level tokenization (FIXTURES.md §1) makes line <-> tokens a exact
    bijection; sinks store the 1-byte/char string view instead of the
    4-byte/int array view (4x less shuffle+storage at 100 TB), and this view
    restores the arrays bit-exactly — the token-array-equality invariant is
    asserted against it in tests/test_pipeline_resume.py.
    """
    return _retokenize_batch(lines)


def with_tokens_view(df, line_col: str = "line"):
    """Attach the reconstructed ``tokens`` column to a sink frame."""
    return df.withColumn("tokens", retokenize_udf(F.col(line_col)))
