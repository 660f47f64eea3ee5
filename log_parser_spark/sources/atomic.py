"""Atomic snapshot sink: write-audit-publish + manifest, Iceberg-style.

The reference stages every report in a mktemp file and atomically `mv`s it
into place at the end (S6: webAccessLogParser.sh:136,1518-1557). At cluster
scale that pattern is an Iceberg snapshot commit. This sandbox has no Iceberg
jars, so ``AtomicTable`` reproduces the semantics on plain parquet:

  - each commit writes to ``<root>/_staging/<txid>`` (invisible to readers),
  - audit hook (row count recorded),
  - atomic ``rename`` to ``<root>/snap=<txid>``,
  - a manifest line is appended to ``<root>/_manifest.jsonl``.

Readers list the manifest and read only committed snapshots. Re-running a
txid is a no-op (idempotent) — this is the resume/checkpoint mechanism the
north rule requires: a job interrupted between sink commits re-executes only
the missing txids and produces no duplicates.

When Iceberg IS on the classpath (real cluster), ``use_iceberg()`` returns
True and callers can swap in `df.writeTo(table).append()` — same contract.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def use_iceberg(spark: SparkSession) -> bool:
    try:
        jvm = spark._jvm  # noqa: SLF001
        jvm.java.lang.Class.forName("org.apache.iceberg.catalog.Catalog")
        return True
    except Exception:
        return False


class AtomicTable:
    """Append-only snapshot table on a directory."""

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.manifest = self.root / "_manifest.jsonl"

    # ------------------------------------------------------------- manifest

    def committed(self) -> dict[str, dict]:
        if not self.manifest.exists():
            return {}
        out: dict[str, dict] = {}
        for ln in self.manifest.read_text().splitlines():
            if ln.strip():
                rec = json.loads(ln)
                out[rec["txid"]] = rec
        return out

    def is_committed(self, txid: str) -> bool:
        return txid in self.committed()

    # --------------------------------------------------------------- commit

    def commit(
        self,
        df: DataFrame,
        txid: str,
        partition_by: list[str] | None = None,
        meta: dict | None = None,
    ) -> dict:
        """Write-audit-publish one snapshot. Idempotent on txid."""
        existing = self.committed().get(txid)
        if existing is not None:
            return existing

        staging = self.root / "_staging" / txid
        if staging.exists():
            import shutil

            shutil.rmtree(staging)  # leftover from a crashed attempt
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(str(staging))

        final = self.root / f"snap={txid}"
        os.rename(staging, final)  # atomic publish

        rec = {
            "txid": txid,
            "path": str(final),
            "committed_at": time.time(),
            "schema": df.schema.json(),  # read() survives empty snapshots
            **(meta or {}),
        }
        with open(self.manifest, "a") as f:
            f.write(json.dumps(rec) + "\n")
        return rec

    # ----------------------------------------------------------------- read

    def snapshot_paths(self) -> list[str]:
        return [rec["path"] for rec in self.committed().values()]

    def _data_paths(self, recs: list[dict]) -> tuple[list[str], list[str]]:
        """Split committed snapshots into (paths-with-data, schemas).

        A committed snapshot whose directory is MISSING is genuine data loss
        and raises; a directory that exists but holds no part files is a
        legitimately-empty snapshot (0-row commit) and is skipped. This is
        the explicit check that replaced a blanket ``except Exception`` which
        used to mask corrupt/deleted snapshots as empty tables.
        """
        paths: list[str] = []
        schemas: list[str] = []
        for r in recs:
            p = Path(r["path"])
            if not p.exists():
                raise FileNotFoundError(
                    f"committed snapshot missing: {p} (txid={r['txid']}) — "
                    "manifest and data disagree; refusing to read as empty"
                )
            if any(p.rglob("part-*.parquet")):
                paths.append(str(p))
            if r.get("schema"):
                schemas.append(r["schema"])
        return paths, schemas

    def _read_recs(self, spark: SparkSession, recs: list[dict]) -> DataFrame | None:
        if not recs:
            return None
        paths, schemas = self._data_paths(recs)
        if not paths:  # every snapshot committed 0 rows
            from pyspark.sql import types as T

            if not schemas:
                raise ValueError(f"{self.root}: empty snapshots and no stored schema")
            schema = T.StructType.fromJson(json.loads(schemas[-1]))
            return spark.createDataFrame([], schema)
        return spark.read.option("basePath", str(self.root)).parquet(*paths)

    def read_txid(self, spark: SparkSession, txid: str) -> DataFrame | None:
        """Read exactly ONE committed snapshot — the Iceberg snapshot-id scan.

        This is what a daily run must use to see only ITS OWN routed rows:
        ``read()`` unions every committed snapshot, so a second run into the
        same table would aggregate duplicated copies of the corpus."""
        rec = self.committed().get(txid)
        return self._read_recs(spark, [rec]) if rec is not None else None

    def read_since(self, spark: SparkSession, txid: str | None) -> DataFrame | None:
        """Incremental read: only snapshots committed strictly AFTER `txid`
        (None -> everything). The Iceberg incremental-scan analogue of the
        reference's partial mode / mid-file skip (javaGCStatsParser.sh:111-120,
        SURVEY.md S5): a consumer records the last txid it processed and
        re-reads only newer snapshots."""
        recs = list(self.committed().values())
        if txid is not None:
            seen = [i for i, r in enumerate(recs) if r["txid"] == txid]
            recs = recs[seen[0] + 1:] if seen else recs
        return self._read_recs(spark, recs)

    def last_txid(self) -> str | None:
        recs = list(self.committed().values())
        return recs[-1]["txid"] if recs else None

    def read(self, spark: SparkSession) -> DataFrame | None:
        return self._read_recs(spark, list(self.committed().values()))
