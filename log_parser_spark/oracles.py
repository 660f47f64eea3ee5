"""DuckDB-SQL replay of the LSH-family operators — closes the last
`no_oracle` gap in the driver correctness gate.

MinHash/SimHash/hyperplane-LSH/IVF results depend on concrete hash and
random-projection constants, so a generic ANSI oracle can't replay them.
But the driver comparison is fully deterministic (same parquet, same
constants), so these generators emit SQL that reproduces each operator's
EXACT result set:

* the 64-bit string hash used by MinHash/SimHash
  (`operators/dedup._hash64_uniques` — little-endian int of md5 bytes
  8..16) equals DuckDB's ``md5_number_lower`` builtin, making every
  signature an integer-exact SQL expression;
* MinHash permutations ``(a*h+b) mod p`` are integer arithmetic —
  replayed in HUGEINT with the (a, b) constants inlined;
* hyperplane signatures / IVF centroids are seeded floats — inlined as
  %.17e literals (exact float64 round-trip, parsed as DOUBLE);
* every float dot/norm is emitted as a LEFT-ASSOCIATED sum, the same
  association `F.aggregate`'s fold uses in
  `operators/similarity._dot/_norm`, so doubles match bit-for-bit.

The IVF coarse quantizer trains on a deterministic bounded sample of the
corpus itself; `ivf_knn_sql` re-runs the same `_kmeans_fit` on the same
sample (read via DuckDB from the driver's sf dir — override with
$SPARK_GRAFT_ORACLE_SF_DIR when checking other scales) and inlines the
centroids.
"""

from __future__ import annotations

import os

import numpy as np

MERSENNE = (1 << 31) - 1

#: the driver's correctness gate runs at sf0.01; data-dependent oracle
#: constants (IVF centroids) are derived from this directory
def _oracle_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _lit(x: float) -> str:
    """Exact float64 literal that DuckDB parses as DOUBLE (not DECIMAL)."""
    return f"{float(x):.17e}"


# --------------------------------------------------------------- text grams

def _grams_ctes(n: int) -> str:
    """Word n-grams per doc, identical to functions.word_ngrams (and to the
    ngram_jaccard oracle): k<=n words yield one truncated gram."""
    return f"""
        w AS (SELECT doc_id, string_split_regex(text, '\\s+') AS ws
              FROM documents),
        g AS (SELECT doc_id,
                     list_distinct(list_transform(
                         range(1, greatest(len(ws) - {n - 1}, 1) + 1),
                         i -> array_to_string(ws[i:i+{n - 1}], ' '))) AS grams
              FROM w)"""


def minhash_lsh_sql(
    n: int = 3, num_perm: int = 16, bands: int = 4,
    threshold: float = 0.5, seed: int = 7,
) -> str:
    """Replay of dedup.minhash_lsh_pairs: signatures -> banded candidates ->
    exact-Jaccard verify, integer-exact."""
    from .operators.dedup import _minhash_params

    a, b = _minhash_params(num_perm, seed)
    rows = num_perm // bands
    perm_vals = ", ".join(
        f"({i}, {a[i]}::HUGEINT, {b[i]}::HUGEINT)" for i in range(num_perm)
    )
    band_vals = ", ".join(f"({j})" for j in range(bands))
    return f"""
        WITH {_grams_ctes(n)},
        e AS (SELECT doc_id, unnest(grams) AS gr FROM g),
        hh AS (SELECT doc_id,
                      CAST(md5_number_lower(gr) AS HUGEINT) % {MERSENNE} AS h
               FROM e),
        perms(i, pa, pb) AS (VALUES {perm_vals}),
        mins AS (SELECT doc_id, i, MIN((pa * h + pb) % {MERSENNE}) AS m
                 FROM hh CROSS JOIN perms GROUP BY doc_id, i),
        sigs AS (SELECT doc_id, list(CAST(m AS VARCHAR) ORDER BY i) AS sig
                 FROM mins GROUP BY doc_id),
        bands(band) AS (VALUES {band_vals}),
        banded AS (SELECT doc_id, band,
                          array_to_string(
                              list_slice(sig, band * {rows} + 1,
                                         band * {rows} + {rows}), ',') AS bsig
                   FROM sigs CROSS JOIN bands),
        cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                 FROM banded x JOIN banded y USING (band, bsig)
                 WHERE x.doc_id < y.doc_id)
        SELECT id_a, id_b, jaccard FROM (
            SELECT id_a, id_b,
                   ROUND(len(list_intersect(ga.grams, gb.grams)) /
                         (len(ga.grams) + len(gb.grams)
                          - len(list_intersect(ga.grams, gb.grams))), 6)
                       AS jaccard
            FROM cand
            JOIN g ga ON ga.doc_id = id_a
            JOIN g gb ON gb.doc_id = id_b)
        WHERE jaccard >= {threshold}
        ORDER BY id_a, id_b
    """


def simhash_pairs_sql(max_hamming: int = 8) -> str:
    """Replay of dedup.simhash_near_dups: per-word md5 bit-votes ->
    pigeonhole block buckets -> exact hamming verify, integer-exact."""
    from .operators.dedup import _block_spec

    spec = _block_spec(64, max_hamming + 1)
    zero64 = "[" + ", ".join(["0"] * 64) + "]"
    block_exprs = ", ".join(
        "{'blk': %d, 'val': %s}"
        % (i, " + ".join(f"bl[{off + j + 1}] * {1 << j}" for j in range(w)))
        for i, (off, w) in enumerate(spec)
    )
    return f"""
        WITH wd AS (SELECT doc_id, string_split_regex(text, '\\s+') AS ws
                    FROM documents),
        wt AS (SELECT doc_id, unnest(ws) AS w FROM wd),
        hw AS (SELECT doc_id, md5_number_lower(w) AS h FROM wt WHERE w <> ''),
        ks AS (SELECT unnest(range(0, 64)) AS k),
        votes AS (SELECT doc_id, k,
                         SUM(CASE WHEN (h >> k) & 1 = 1 THEN 1 ELSE -1 END) AS v
                  FROM hw CROSS JOIN ks GROUP BY doc_id, k),
        bl0 AS (SELECT doc_id,
                       list(CASE WHEN v > 0 THEN 1 ELSE 0 END ORDER BY k) AS bl
                FROM votes GROUP BY doc_id),
        bits AS (SELECT d.doc_id, COALESCE(bl0.bl, {zero64}) AS bl
                 FROM documents d LEFT JOIN bl0 USING (doc_id)),
        ex AS (SELECT doc_id, unnest([{block_exprs}]) AS b FROM bits),
        exf AS (SELECT doc_id, (b).blk AS blk, (b).val AS val FROM ex),
        cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                 FROM exf x JOIN exf y USING (blk, val)
                 WHERE x.doc_id < y.doc_id)
        SELECT id_a, id_b, hamming FROM (
            SELECT id_a, id_b,
                   CAST(list_sum(list_transform(range(1, 65),
                        i -> CASE WHEN ba.bl[i] = bb.bl[i] THEN 0 ELSE 1 END))
                       AS INTEGER) AS hamming
            FROM cand
            JOIN bits ba ON ba.doc_id = id_a
            JOIN bits bb ON bb.doc_id = id_b)
        WHERE hamming <= {max_hamming}
        ORDER BY id_a, id_b
    """


# --------------------------------------------------------------- embeddings

def _plane_dot(plane: list[float]) -> str:
    """dot(v, literal plane) as a left-associated sum — bit-identical to
    similarity._dot's fold."""
    return " + ".join(f"v[{i + 1}] * {_lit(p)}" for i, p in enumerate(plane))


def _sig_expr(planes: list[list[float]]) -> str:
    bits = " || ".join(
        f"CASE WHEN {_plane_dot(p)} >= 0 THEN '1' ELSE '0' END" for p in planes
    )
    return f"({bits})"


_EMB = "emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"


def _cos(a: str, b: str, dim: int) -> str:
    """cosine(a, b) with every sum left-associated like similarity._dot/_norm."""
    def dot(x: str, y: str) -> str:
        return (f"list_reduce(list_transform(range(1, {dim + 1}), "
                f"i -> {x}[i] * {y}[i]), (acc, t) -> acc + t)")

    return f"({dot(a, b)} / (sqrt({dot(a, a)}) * sqrt({dot(b, b)})))"


def _tagged_cte(dim: int, n_planes: int, n_tables: int, seed: int) -> str:
    """(vec_id, tbl, sig) rows: one hyperplane signature per table, the
    constants from similarity._hyperplanes inlined."""
    from .operators.similarity import _hyperplanes

    selects = " UNION ALL ".join(
        f"SELECT vec_id, v, {t} AS tbl, "
        f"{_sig_expr(_hyperplanes(dim, n_planes, seed + 97 * t))} AS sig FROM emb"
        for t in range(n_tables)
    )
    return f"tagged AS ({selects})"


def lsh_knn_sql(
    query_ids: list[int], k: int = 5, n_planes: int = 4, n_tables: int = 8,
    dim: int = 64, seed: int = 11,
) -> str:
    """Replay of similarity.lsh_knn: multi-table bucket candidates ->
    exact cosine rank within the union."""
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
        WITH {_EMB},
        {_tagged_cte(dim, n_planes, n_tables, seed)},
        q AS (SELECT vec_id AS query_id, tbl, sig FROM tagged
              WHERE vec_id IN ({ids})),
        cand AS (SELECT DISTINCT q.query_id, t.vec_id
                 FROM tagged t JOIN q USING (tbl, sig)
                 WHERE t.vec_id <> q.query_id)
        SELECT query_id, ev.vec_id AS neighbor_id,
               CAST(row_number() OVER (
                    PARTITION BY query_id
                    ORDER BY {_cos('ev.v', 'eq.v', dim)} DESC,
                             ev.vec_id ASC) AS INTEGER) AS rank,
               ROUND({_cos('ev.v', 'eq.v', dim)}, 6) AS cos
        FROM cand
        JOIN emb ev ON ev.vec_id = cand.vec_id
        JOIN emb eq ON eq.vec_id = cand.query_id
        QUALIFY rank <= {k}
        ORDER BY query_id, rank
    """


def near_dup_lsh_sql(
    threshold: float = 0.4, n_planes: int = 6, n_tables: int = 10,
    dim: int = 64, seed: int = 11,
) -> str:
    """Replay of similarity.near_dup_pairs_lsh: bucket-collision pairs ->
    exact cosine >= threshold (filter on the unrounded value, like Spark)."""
    return f"""
        WITH {_EMB},
        {_tagged_cte(dim, n_planes, n_tables, seed)},
        pairs AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
                  FROM tagged x JOIN tagged y USING (tbl, sig)
                  WHERE x.vec_id < y.vec_id)
        SELECT id_a, id_b, ROUND({_cos('ea.v', 'eb.v', dim)}, 6) AS cos
        FROM pairs
        JOIN emb ea ON ea.vec_id = id_a
        JOIN emb eb ON eb.vec_id = id_b
        WHERE {_cos('ea.v', 'eb.v', dim)} >= {threshold}
        ORDER BY id_a, id_b
    """


def ivf_knn_sql(
    query_ids: list[int], k: int = 5, n_cells: int = 8, n_probe: int = 4,
    sample: int = 2048, dim: int = 64, seed: int = 13,
) -> str:
    """Replay of similarity.ivf_knn: re-trains the SAME coarse quantizer on
    the SAME deterministic sample (read via DuckDB from the oracle sf dir),
    inlines the centroids, then replays cell-assign -> probe -> exact rank.

    Cell/probe ordering is (score DESC, cell ASC), matching the kernel's
    first-max argmax and stable argsort; scores here drop the query-side
    normalization (a positive per-row scale that cannot change the order).
    """
    import duckdb

    from .operators.similarity import _kmeans_fit

    emb_path = os.path.join(_oracle_sf_dir(), "embeddings.parquet")
    rows = duckdb.sql(
        f"SELECT CAST(embedding AS DOUBLE[]) AS v "
        f"FROM read_parquet('{emb_path}') ORDER BY vec_id LIMIT {sample}"
    ).fetchall()
    X = np.asarray([r[0] for r in rows], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = _kmeans_fit(X, n_cells, iters=8, seed=seed)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    cell_structs = ", ".join(
        "{'j': %d, 'd': %s}" % (j, _plane_dot(list(Cn[j])))
        for j in range(len(Cn))
    )
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
        WITH {_EMB},
        cd AS (SELECT vec_id, v, unnest([{cell_structs}]) AS jd FROM emb),
        cf AS (SELECT vec_id, v, (jd).j AS j, (jd).d AS d FROM cd),
        cells AS (SELECT vec_id, j AS cell FROM cf
                  QUALIFY row_number() OVER (
                      PARTITION BY vec_id ORDER BY d DESC, j ASC) = 1),
        probes AS (SELECT vec_id AS query_id, j AS cell FROM cf
                   WHERE vec_id IN ({ids})
                   QUALIFY row_number() OVER (
                       PARTITION BY vec_id ORDER BY d DESC, j ASC) <= {n_probe}),
        cand AS (SELECT DISTINCT p.query_id, c.vec_id
                 FROM cells c JOIN probes p USING (cell)
                 WHERE c.vec_id <> p.query_id)
        SELECT query_id, ev.vec_id AS neighbor_id,
               CAST(row_number() OVER (
                    PARTITION BY query_id
                    ORDER BY {_cos('ev.v', 'eq.v', dim)} DESC,
                             ev.vec_id ASC) AS INTEGER) AS rank,
               ROUND({_cos('ev.v', 'eq.v', dim)}, 6) AS cos
        FROM cand
        JOIN emb ev ON ev.vec_id = cand.vec_id
        JOIN emb eq ON eq.vec_id = cand.query_id
        QUALIFY rank <= {k}
        ORDER BY query_id, rank
    """
