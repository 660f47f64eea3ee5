"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and (where
present) the matching ``oracle_sql()`` on DuckDB over the same parquet
tables, then compares row count, sorted-column schema, and an
order-insensitive value hash. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod  # noqa: E402
from log_parser_spark.session import get_spark  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def value_repr(df: pd.DataFrame) -> list[tuple]:
    out = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                # NaN != NaN would make identical frames "differ"
                vals.append("NaN" if v != v else round(v, 9))
            else:
                vals.append(v)
        out.append(tuple(vals))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # data-dependent oracle constants (IVF centroids) must come from the
    # same tables the queries read
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    spark = get_spark(cores=8, app_name="oracle-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    gate: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            gate[name] = {"status": "fail", "err": f"spark: {exc}"[:300]}
            print(f"FAIL  {name}: spark error {exc}")
            continue
        el = time.time() - t0
        if name not in oracles:
            gate[name] = {"status": "rows_only", "rows": len(sdf),
                          "elapsed_s": round(el, 1)}
            print(f"ROWS  {name}: {len(sdf)} rows ({el:.1f}s, rows-only)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            gate[name] = {"status": "fail", "err": f"duckdb: {exc}"[:300]}
            print(f"FAIL  {name}: duckdb error {exc}")
            continue
        s, o = normalize(sdf), normalize(odf)
        status = []
        if len(s) != len(o):
            status.append(f"rowcount {len(s)} vs {len(o)}")
        if list(s.columns) != list(o.columns):
            status.append(f"cols {list(s.columns)} vs {list(o.columns)}")
        else:
            st = [str(t) for t in s.dtypes]
            ot = [str(t) for t in o.dtypes]
            if st != ot:
                status.append(f"dtypes {st} vs {ot}")
            if not status and value_repr(s) != value_repr(o):
                diff = [
                    (a, b)
                    for a, b in zip(value_repr(s), value_repr(o))
                    if a != b
                ][:3]
                status.append(f"values differ, first: {diff}")
        if status:
            failures.append(name)
            gate[name] = {"status": "fail", "err": "; ".join(status)[:300]}
            print(f"FAIL  {name}: {'; '.join(status)}")
        else:
            gate[name] = {"status": "ok_hash", "rows": len(s),
                          "elapsed_s": round(el, 1)}
            print(f"OK    {name}: {len(s)} rows ({el:.1f}s)")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall green")
    # committable gate artifact (VERDICT r3 ask #3): GATE_JSON=path
    gate_path = os.environ.get("GATE_JSON")
    if gate_path:
        import json

        summary = {
            "sf_dir": sf_dir,
            "total": len(gate),
            "ok_hash": sum(1 for g in gate.values() if g["status"] == "ok_hash"),
            "rows_only": sum(1 for g in gate.values() if g["status"] == "rows_only"),
            "fail": len(failures),
            "failures": failures,
            "queries": gate,
        }
        Path(gate_path).write_text(json.dumps(summary, indent=1) + "\n")
        print(f"gate json -> {gate_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
