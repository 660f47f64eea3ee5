"""Similarity search over an embedding column (array<float>).

  - brute-force cosine top-k (baseline; exact, SQL-checkable)
  - LSH-bucketed ANN via random hyperplanes (the scale path)

Dot products are pure column expressions (zip_with + aggregate) — JVM-side,
no Python. At 100 TB the brute-force path is a broadcast of the (small)
query set against the big corpus: one scan, no shuffle until the final
per-query top-k (TakeOrderedAndProject per group via window)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0).cast("double"), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0).cast("double"), lambda acc, v: acc + v))


def cosine_cols(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_knn(embeddings: DataFrame, query_ids: list[int], k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query set is tiny -> broadcast join (cross within query rows only);
    ranking via window row_number — compiles to a per-group top-k heap.
    """
    emb_d = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb_d.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        emb_d.join(F.broadcast(q), emb_d["vec_id"] != q["query_id"])
        .withColumn("cos", cosine_cols(F.col("qv"), F.col("v")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank")
        .orderBy("query_id", "rank")
    )


def near_dup_pairs(embeddings: DataFrame, threshold: float = 0.9) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above threshold (exact).

    Test-scale all-pairs; the LSH variant below is the scale path.
    """
    emb_d = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a = emb_d.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = emb_d.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine_cols(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 11) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).round(6).tolist()


def lsh_signature(col, planes: list[list[float]]):
    """Random-hyperplane signature: bit i = sign(dot(v, plane_i))."""
    bits = [
        F.when(_dot(col, F.array(*[F.lit(x) for x in p])) >= 0, F.lit(1)).otherwise(F.lit(0))
        for p in planes
    ]
    return F.concat_ws("", *[b.cast("string") for b in bits])


def lsh_knn(
    embeddings: DataFrame, query_ids: list[int], k: int = 5,
    n_planes: int = 4, n_tables: int = 8, dim: int | None = None, seed: int = 11,
) -> DataFrame:
    """ANN: multi-table random-hyperplane LSH, exact rank within the
    candidate union (standard L-tables x b-bits scheme).

    Scale path: all L signatures are per-row expressions computed in one
    scan (no shuffle); candidates = union over tables of same-bucket rows,
    deduped, then scored exactly. Recall grows as 1-(1-p^b)^L; tests measure
    recall vs the brute-force baseline rather than asserting equality.
    """
    if dim is None:
        # Array columns carry no length in the schema and an operator must
        # not run driver actions (.first()) to sniff one — require it.
        raise ValueError("lsh_knn requires `dim` explicitly (e.g. dim=64)")
    emb_d = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    sigs = [
        lsh_signature(F.col("v"), _hyperplanes(dim, n_planes, seed + 97 * t))
        for t in range(n_tables)
    ]
    tagged = emb_d.select(
        "vec_id", "v",
        F.explode(
            F.array(*[
                F.struct(F.lit(t).alias("tbl"), s.alias("sig"))
                for t, s in enumerate(sigs)
            ])
        ).alias("ts"),
    ).select("vec_id", "v", F.col("ts.tbl").alias("tbl"), F.col("ts.sig").alias("sig"))

    q = tagged.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "tbl", "sig"
    )
    cands = (
        tagged.join(F.broadcast(q), ["tbl", "sig"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")  # dedupe across tables
        .agg(F.first("qv").alias("qv"), F.first("v").alias("v"))
        .withColumn("cos", cosine_cols(F.col("qv"), F.col("v")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank", F.round("cos", 6).alias("cos"))
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------- IVF

def _kmeans_fit(X: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Tiny deterministic SPHERICAL k-means on the driver (training is on a
    bounded sample; assignment stays distributed). X must be row-normalized;
    centroids are re-normalized after every Lloyd step so training assigns
    by the same cosine metric the serving UDFs use (a Euclidean/cosine
    train-serve mismatch costs recall). k is clamped to the sample size."""
    rng = np.random.RandomState(seed)
    k = min(k, len(X))
    C = X[rng.choice(len(X), size=k, replace=False)].astype(np.float64)
    C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    for _ in range(iters):
        assign = (X @ C.T).argmax(1)  # cosine on normalized rows
        for j in range(k):
            m = assign == j
            if m.any():
                C[j] = X[m].mean(0)
        C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return C


def ivf_knn(
    embeddings: DataFrame, query_ids: list[int], k: int = 5,
    n_cells: int = 16, n_probe: int = 4, sample: int = 2048,
    dim: int | None = None, seed: int = 13,
) -> DataFrame:
    """IVF (inverted-file) ANN: coarse k-means quantizer -> per-cell
    inverted lists -> probe the n_probe nearest cells per query -> exact
    cosine rank within the probed union.

    Scale shape: training reads a BOUNDED deterministic sample to the
    driver (standard IVF practice — the codebook is tiny and broadcast);
    cell assignment is one Arrow-batched matrix multiply per batch (no
    shuffle); the probe join touches only n_probe/n_cells of the corpus.
    At 100 TB the cell column becomes the table's partition key so a probe
    is partition pruning, not a scan."""
    from pyspark.sql import types as T

    if dim is None:
        raise ValueError("ivf_knn requires `dim` explicitly (e.g. dim=64)")

    emb_d = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    train = (
        emb_d.orderBy("vec_id").limit(sample)
        .select("v").toPandas()["v"].tolist()
    )
    X = np.asarray(train, dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = _kmeans_fit(X, n_cells, iters=8, seed=seed)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    @F.pandas_udf(T.IntegerType())
    def cell_udf(v: pd.Series) -> pd.Series:
        M = np.asarray(v.tolist(), dtype=np.float64)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        return pd.Series((M @ Cn.T).argmax(1).astype(np.int32), index=v.index)

    celled = emb_d.withColumn("cell", cell_udf("v"))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_udf(v: pd.Series) -> pd.Series:
        M = np.asarray(v.tolist(), dtype=np.float64)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        # stable sort: equal cell scores resolve to the lower cell index,
        # the same tie-break the SQL oracle's (score DESC, cell ASC) uses
        order = np.argsort(-(M @ Cn.T), axis=1, kind="stable")[:, :n_probe].astype(np.int32)
        return pd.Series(list(order), index=v.index)

    q = (
        emb_d.filter(F.col("vec_id").isin(query_ids))
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
                F.explode(probe_udf("v")).alias("cell"))
    )
    cands = (
        celled.join(F.broadcast(q), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", cosine_cols(F.col("qv"), F.col("v")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank",
                F.round("cos", 6).alias("cos"))
        .orderBy("query_id", "rank")
    )


def near_dup_pairs_lsh(
    embeddings: DataFrame, threshold: float = 0.9,
    n_planes: int = 6, n_tables: int = 10, dim: int | None = None,
    seed: int = 11,
) -> DataFrame:
    """Embedding-cosine near-dup PAIRS via multi-table hyperplane LSH — the
    scale path for `near_dup_pairs` (which is an all-pairs product kept for
    oracle parity at test scale).

    Same-bucket rows in ANY table become candidates (high-cosine pairs
    collide with probability (1 - theta/pi)^b per table), the exact cosine
    filter then verifies. Shuffle volume = rows x tables tiny keys; no
    all-pairs join anywhere in the plan."""
    if dim is None:
        raise ValueError("near_dup_pairs_lsh requires `dim` explicitly")
    emb_d = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    sigs = [
        lsh_signature(F.col("v"), _hyperplanes(dim, n_planes, seed + 97 * t))
        for t in range(n_tables)
    ]
    tagged = emb_d.select(
        "vec_id", "v",
        F.explode(
            F.array(*[
                F.struct(F.lit(t).alias("tbl"), s.alias("sig"))
                for t, s in enumerate(sigs)
            ])
        ).alias("ts"),
    ).select("vec_id", "v", F.col("ts.tbl").alias("tbl"), F.col("ts.sig").alias("sig"))

    a = tagged.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"), "tbl", "sig")
    b = tagged.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), "tbl", "sig")
    return (
        a.join(b, ["tbl", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        .distinct()
        .withColumn("cos", cosine_cols(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )
