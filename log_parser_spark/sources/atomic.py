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

    def _rewrite_manifest(self, recs: list[dict]) -> None:
        """Atomically replace the manifest (write tmp + rename).

        Maintenance ops (compact/expire) are single-writer jobs run at a
        batch boundary — the same contract as Iceberg's table maintenance
        actions. Appending commits racing a maintenance rewrite would be
        lost; callers must not run them concurrently (documented, asserted
        nowhere — plain parquet has no optimistic-commit loop to retry on).
        """
        tmp = self.root / "_manifest.jsonl.tmp"
        tmp.write_text("".join(json.dumps(r) + "\n" for r in recs))
        os.rename(tmp, self.manifest)

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
            if r.get("expired"):
                raise ValueError(
                    f"snapshot {r['txid']} was expired by expire_snapshots(); "
                    f"its data lives on in compaction snapshot "
                    f"{r.get('replaced_by')}"
                )
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

    def _live(self, recs: list[dict]) -> list[dict]:
        """Records whose data is current (not superseded by a compaction)."""
        return [r for r in recs if not r.get("replaced_by")]

    def read_txid(self, spark: SparkSession, txid: str) -> DataFrame | None:
        """Read exactly ONE committed snapshot — the Iceberg snapshot-id scan.

        This is what a daily run must use to see only ITS OWN routed rows:
        ``read()`` unions every committed snapshot, so a second run into the
        same table would aggregate duplicated copies of the corpus.

        A snapshot replaced by ``compact()`` stays readable (time travel)
        until ``expire_snapshots()`` removes its files; reading an expired
        snapshot raises a clear error (from ``_data_paths``) rather than
        the data-loss one."""
        rec = self.committed().get(txid)
        return self._read_recs(spark, [rec]) if rec is not None else None

    def read_since(self, spark: SparkSession, txid: str | None) -> DataFrame | None:
        """Incremental read: only snapshots committed strictly AFTER `txid`
        (None -> everything). The Iceberg incremental-scan analogue of the
        reference's partial mode / mid-file skip (javaGCStatsParser.sh:111-120,
        SURVEY.md S5): a consumer records the last txid it processed and
        re-reads only newer snapshots.

        Compaction interplay (same contract as Iceberg's incremental scan
        over a rewrite): a compaction snapshot is skipped when EVERY source
        snapshot it folded was at-or-before the watermark (the consumer
        already saw those rows) and included when every source is after it.
        When it straddles, the unconsumed post-watermark sources are served
        DIRECTLY (time travel — they stay on disk until
        ``expire_snapshots``); a consumer checkpointed exactly at a
        compaction txid therefore keeps reading increments. Only when those
        sources are already expired does this raise — at that point the
        un-seen rows exist only inside a fold that also contains seen rows,
        so an exact increment is genuinely impossible."""
        recs = list(self.committed().values())
        order = {r["txid"]: i for i, r in enumerate(recs)}
        by_txid = {r["txid"]: r for r in recs}

        if txid is not None and txid in order:
            cut = order[txid]

            def roots(r: dict) -> list[str]:
                # resolve a (possibly nested) compaction to its base
                # snapshots, but stop at anything the consumer already saw
                # (index <= cut): a consumed fold is a leaf, not a subtree
                src = r.get("compacted_from")
                if not src:
                    return [r["txid"]]
                out: list[str] = []
                for s in src:
                    if order[s] <= cut:
                        out.append(s)
                    else:
                        out.extend(roots(by_txid[s]))
                return out

            picked: dict[str, dict] = {}
            for i, r in enumerate(recs):
                if i <= cut:
                    continue
                if r.get("compacted_from"):
                    base = roots(r)
                    after = [s for s in base if order[s] > cut]
                    if not after:
                        continue  # folded only already-seen snapshots
                    if len(after) < len(base):
                        # straddling fold: serve the unconsumed sources
                        # directly while their files still exist
                        gone = [s for s in after if by_txid[s].get("expired")]
                        if gone:
                            raise ValueError(
                                f"incremental read from txid={txid} crosses "
                                f"compaction {r['txid']} whose unconsumed "
                                f"sources {gone} were expired; re-read from "
                                "scratch or checkpoint at a maintenance "
                                "boundary before expiring"
                            )
                        for s in after:
                            picked[s] = {
                                k: v for k, v in by_txid[s].items()
                                if k != "replaced_by"
                            }
                        continue
                picked.setdefault(r["txid"], r)
            recs = list(picked.values())
        return self._read_recs(spark, self._live(recs))

    def last_txid(self) -> str | None:
        recs = list(self.committed().values())
        return recs[-1]["txid"] if recs else None

    def read(self, spark: SparkSession) -> DataFrame | None:
        return self._read_recs(spark, self._live(list(self.committed().values())))

    # ---------------------------------------------------------- maintenance

    def partition_columns(self) -> list[str]:
        """Discover the hive partition layout (`key=value` dirs) of the
        live snapshots, outermost first — lets maintenance re-write with
        the same layout so partition pruning survives compaction."""
        for rec in self._live(list(self.committed().values())):
            cur = Path(rec["path"])
            cols: list[str] = []
            while cur.exists():
                subs = [d for d in cur.iterdir() if d.is_dir() and "=" in d.name]
                if not subs:
                    break
                cols.append(subs[0].name.split("=", 1)[0])
                cur = subs[0]
            if cols:
                return cols
        return []

    def file_stats(self) -> dict:
        """Live part-file count and bytes — the compaction trigger metric."""
        n, size = 0, 0
        for rec in self._live(list(self.committed().values())):
            p = Path(rec["path"])
            if p.exists():
                for f in p.rglob("part-*.parquet"):
                    n += 1
                    size += f.stat().st_size
        return {"files": n, "bytes": size}

    def compact(
        self,
        spark: SparkSession,
        txid: str,
        target_file_bytes: int = 128 * 1024 * 1024,
        partition_by: list[str] | None = None,
    ) -> dict | None:
        """Bin-pack every live snapshot into ONE new snapshot — the Iceberg
        ``rewrite_data_files`` action re-expressed on the plain-parquet
        snapshot layout.

        Micro-batch / per-day commits accumulate small files (at 100 TB a
        streaming sink emits thousands per hour); scans then pay one task +
        one open per file. ``compact`` reads the live union, coalesces to
        ``ceil(live_bytes / target_file_bytes)`` output files (coalesce, not
        repartition: bin-packing needs no shuffle; with ``partition_by`` the
        write re-partitions by the partition columns instead so each
        directory gets locality), publishes it as a normal write-audit-
        publish snapshot AND flags the sources ``replaced_by`` in ONE atomic
        manifest rewrite — publishing the fold and retiring its sources in
        two steps would leave a crash window where read() double-counts
        every folded row. Source data stays on disk for time travel until
        ``expire_snapshots()`` — exactly Iceberg's two-step contract.
        Idempotent on txid like ``commit``; the idempotent path also
        REPAIRS a manifest left by a pre-fix crash (compaction committed,
        sources unflagged). Returns None when there is nothing to fold
        (fewer than two live data snapshots).
        """
        existing = self.committed().get(txid)
        if existing is not None:
            # repair: if any folded source lost its replaced_by flag (a
            # crash between the old two-step publish), re-flag and rewrite
            folded = set(existing.get("compacted_from") or [])
            merged = list(self.committed().values())
            dirty = False
            for r in merged:
                if r["txid"] in folded and not r.get("replaced_by"):
                    r["replaced_by"] = txid
                    dirty = True
            if dirty:
                self._rewrite_manifest(merged)
            return existing
        recs = list(self.committed().values())
        live = self._live(recs)
        paths, _ = self._data_paths(live)
        if len(live) < 2 or not paths:
            return None
        df = spark.read.option("basePath", str(self.root)).parquet(*paths)
        stats = self.file_stats()
        n_files = max(1, -(-stats["bytes"] // max(1, target_file_bytes)))
        if partition_by:
            out = df.repartition(n_files, *partition_by)
        else:
            out = df.coalesce(n_files)

        # stage + publish the data directory (crash before the manifest
        # rewrite leaves an orphan snap dir that is invisible to readers
        # and reclaimed on retry)
        staging = self.root / "_staging" / txid
        if staging.exists():
            import shutil

            shutil.rmtree(staging)
        writer = out.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(str(staging))
        final = self.root / f"snap={txid}"
        if final.exists():  # orphan from a crashed attempt, never committed
            import shutil

            shutil.rmtree(final)
        os.rename(staging, final)

        rec = {
            "txid": txid,
            "path": str(final),
            "committed_at": time.time(),
            "schema": out.schema.json(),
            "compacted_from": [r["txid"] for r in live],
            "files_before": stats["files"],
            "bytes": stats["bytes"],
        }
        # single atomic manifest rewrite: append the compaction rec and
        # flag its sources together — no intermediate double-count state
        merged = list(self.committed().values())
        folded = set(rec["compacted_from"])
        for r in merged:
            if r["txid"] in folded:
                r["replaced_by"] = txid
        self._rewrite_manifest(merged + [rec])
        return rec

    def expire_snapshots(self) -> list[str]:
        """Delete the data files of snapshots a compaction replaced — the
        Iceberg ``expire_snapshots`` action. The manifest records stay (so
        ``is_committed`` keeps resume idempotent and the lineage of every
        txid survives) but gain ``expired: true``; their directories are
        removed. Live snapshots are never touched. Returns removed paths."""
        import shutil

        recs = list(self.committed().values())
        removed: list[str] = []
        for r in recs:
            if r.get("replaced_by") and not r.get("expired"):
                p = Path(r["path"])
                if p.exists():
                    shutil.rmtree(p)
                r["expired"] = True
                removed.append(r["path"])
        if removed:
            self._rewrite_manifest(recs)
        return removed
