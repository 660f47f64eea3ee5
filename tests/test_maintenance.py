"""Snapshot-table maintenance: compaction + expiration.

The Iceberg actions `rewrite_data_files` / `expire_snapshots` re-expressed
on the plain-parquet snapshot layout (sources/atomic.py). At 100 TB a
micro-batch sink accumulates thousands of small files; compaction bin-packs
them into target-size files in one new snapshot without breaking the
resume contract (is_committed stays true for folded txids) or time travel
(folded snapshots stay readable until expired).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_parser_spark.sources.atomic import AtomicTable


@pytest.fixture()
def table(spark, tmp_path):
    t = AtomicTable(tmp_path / "tbl")
    for day in range(4):
        df = (
            spark.range(day * 100, day * 100 + 100)
            .select(
                F.col("id"),
                (F.col("id") % 3).cast("int").alias("bucket"),
            )
            .repartition(8)  # force 8 tiny part files per commit
        )
        t.commit(df, f"day{day}")
    return t


def test_compact_folds_files_and_preserves_rows(spark, table):
    before = table.file_stats()
    assert before["files"] >= 32  # 4 commits x 8 files

    rec = table.compact(spark, "maint1", target_file_bytes=1 << 30)
    assert rec is not None
    assert sorted(rec["compacted_from"]) == ["day0", "day1", "day2", "day3"]

    after = table.file_stats()
    assert after["files"] == 1  # 400 tiny rows bin-pack into one target file

    got = table.read(spark)
    assert got.count() == 400
    assert got.select("id").distinct().count() == 400  # no dup, no loss
    assert got.agg(F.sum("id")).collect()[0][0] == sum(range(400))


def test_compact_keeps_resume_idempotence(spark, table):
    table.compact(spark, "maint1", target_file_bytes=1 << 30)
    # the resume mechanism checks is_committed(txid): folded snapshots must
    # still read as committed or a resumed day-job would re-append its rows
    for day in range(4):
        assert table.is_committed(f"day{day}")
    n0 = table.read(spark).count()
    df = table.read_txid(spark, "day0")  # recommit attempt is a no-op
    table.commit(df, "day0")
    assert table.read(spark).count() == n0
    # compaction itself is idempotent on txid
    again = table.compact(spark, "maint1")
    assert again["txid"] == "maint1"
    assert table.read(spark).count() == n0


def test_time_travel_until_expiry(spark, table):
    table.compact(spark, "maint1", target_file_bytes=1 << 30)
    # folded snapshot still readable (time travel) before expiry
    assert table.read_txid(spark, "day2").count() == 100

    removed = table.expire_snapshots()
    assert len(removed) == 4
    # expired snapshot -> clear error naming the replacement, not data-loss
    with pytest.raises(ValueError, match="expired.*maint1"):
        table.read_txid(spark, "day2")
    # live data unaffected; second expire is a no-op
    assert table.read(spark).count() == 400
    assert table.expire_snapshots() == []


def test_commits_after_compaction_and_refold(spark, table):
    table.compact(spark, "maint1", target_file_bytes=1 << 30)
    table.commit(
        spark.range(400, 450).select(
            F.col("id"), (F.col("id") % 3).cast("int").alias("bucket")
        ),
        "day4",
    )
    assert table.read(spark).count() == 450
    # a second compaction folds the first compaction + the new commit
    rec = table.compact(spark, "maint2", target_file_bytes=1 << 30)
    assert sorted(rec["compacted_from"]) == ["day4", "maint1"]
    assert table.read(spark).count() == 450
    assert table.file_stats()["files"] == 1


def test_incremental_read_across_compaction(spark, table):
    # consumer checkpointed at day3 (== maintenance boundary): the
    # compaction folds only already-seen snapshots and is skipped
    table.compact(spark, "maint1", target_file_bytes=1 << 30)
    assert table.read_since(spark, "day3") is None or \
        table.read_since(spark, "day3").count() == 0

    table.commit(
        spark.range(400, 450).select(
            F.col("id"), (F.col("id") % 3).cast("int").alias("bucket")
        ),
        "day4",
    )
    inc = table.read_since(spark, "day3")
    assert inc.count() == 50  # only day4; maint1's rows were already seen

    # the second compaction folds maint1 (seen) + day4 (unseen): the
    # unconsumed source is served DIRECTLY via time travel — no error,
    # no dup rows — as long as its files still exist
    table.compact(spark, "maint2", target_file_bytes=1 << 30)
    inc2 = table.read_since(spark, "day3")
    assert inc2.count() == 50
    assert sorted(r["id"] for r in inc2.collect()) == list(range(400, 450))
    # consumer checkpointed exactly at the first compaction txid: same
    # increment (maint1's roots are all consumed; day4 served directly)
    inc3 = table.read_since(spark, "maint1")
    assert inc3.count() == 50

    # once the straddled source is EXPIRED the exact increment is truly
    # impossible -> explicit error, never dup rows
    table.expire_snapshots()
    with pytest.raises(ValueError, match="expired"):
        table.read_since(spark, "day3").count()
    # a consumer checkpointed at the latest compaction keeps working
    assert table.read_since(spark, "maint2") is None or \
        table.read_since(spark, "maint2").count() == 0


def test_compact_single_rewrite_and_crash_repair(spark, table):
    """The fold and its sources' replaced_by flags must land in ONE
    manifest state (no double-count window), and compact(txid) must repair
    a manifest left half-published by a pre-fix crash."""
    import json

    rec = table.compact(spark, "maint1", target_file_bytes=1 << 30)
    assert table.read(spark).count() == 400  # never double-counted

    # simulate the old crash: compaction rec present, source flags lost
    recs = list(table.committed().values())
    for r in recs:
        r.pop("replaced_by", None)
    table._rewrite_manifest(recs)
    assert table.read(spark).count() == 800  # the crash state DOES dup

    again = table.compact(spark, "maint1")  # idempotent path repairs
    assert again["txid"] == rec["txid"]
    assert table.read(spark).count() == 400
    flags = {
        r["txid"]: r.get("replaced_by")
        for r in table.committed().values()
        if r["txid"].startswith("day")
    }
    assert all(v == "maint1" for v in flags.values())


def test_cli_maintain_compacts_out_tree(spark, dataset_dir, tmp_path, capsys):
    """`main.py --maintain` = the daily maintenance job: every snapshot
    table under --out is bin-packed and its replaced snapshots expired,
    and the reports stay readable afterwards."""
    import json

    import main as cli

    rc = cli.main([
        "--dataset", str(dataset_dir), "--out", str(tmp_path / "out"),
        "--cores", "8", "--maintain",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    maint = out["maintenance"]
    # the bundled report chunks (several commits) must have been folded
    assert maint["reports"]["compacted"] is True
    assert maint["reports"]["expired_snapshots"] >= 2
    assert maint["reports"]["live_files"] >= 1

    from log_parser_spark.plans.pipeline import read_report

    sc = read_report(spark, tmp_path / "out", "status_counts")
    assert sc.count() > 0
    # compaction preserved the partition layout of partitioned tables
    sinks = AtomicTable(tmp_path / "out" / "sinks")
    if maint["sinks"]["compacted"]:
        assert sinks.partition_columns() == ["category"]


def test_partitioned_compaction(spark, tmp_path):
    t = AtomicTable(tmp_path / "part_tbl")
    for day in range(3):
        df = (
            spark.range(day * 90, day * 90 + 90)
            .select(
                F.col("id"),
                (F.col("id") % 3).cast("string").alias("cat"),
            )
            .repartition(6)
        )
        t.commit(df, f"d{day}", partition_by=["cat"])
    before = t.file_stats()["files"]
    t.compact(spark, "m", target_file_bytes=1 << 30, partition_by=["cat"])
    assert t.file_stats()["files"] < before
    got = t.read(spark)
    assert got.count() == 270
    assert got.groupBy("cat").count().count() == 3
    # partition directory layout preserved for pruning
    snap = [p for p in (tmp_path / "part_tbl").glob("snap=m/cat=*")]
    assert len(snap) == 3


def test_multiday_incremental_pipeline_with_midstream_compaction(
    spark, dataset_dir, tmp_path, truth,
):
    """The real daily-job shape (VERDICT r3 ask #8): three recorddates into
    ONE out dir, table maintenance (--maintain: compact + expire) after day
    2, an incremental consumer checkpointed AT the maintenance boundary —
    day-3 increments and history rows must be exact post-compaction
    (S5 + S8 + S11 exercised together)."""
    import main as cli
    from log_parser_spark.plans.pipeline import read_report

    out = tmp_path / "daily"
    days = ["2015-06-11", "2015-06-12", "2015-06-13"]

    rc = cli.main([
        "--dataset", str(dataset_dir), "--out", str(out),
        "--cores", "8", "--recorddate", days[0],
    ])
    assert rc == 0
    rc = cli.main([
        "--dataset", str(dataset_dir), "--out", str(out),
        "--cores", "8", "--recorddate", days[1], "--maintain",
    ])
    assert rc == 0

    sinks = AtomicTable(out / "sinks")
    # maintenance ran last: the consumer checkpoint IS the compaction txid
    boundary = sinks.last_txid()
    assert boundary == f"maint-{days[1]}"
    pre_rows = sinks.read(spark).count()

    rc = cli.main([
        "--dataset", str(dataset_dir), "--out", str(out),
        "--cores", "8", "--recorddate", days[2],
    ])
    assert rc == 0

    # day-3 increment from the maintenance boundary = exactly day 3's
    # routed snapshot, no replay of folded day-1/2 rows, no dups
    inc = sinks.read_since(spark, boundary)
    day3 = sinks.read_txid(spark, f"{days[2]}-routed")
    assert inc.count() == day3.count() > 0
    # full table = compacted days 1-2 + day 3 (expire left no double-count)
    assert sinks.read(spark).count() == pre_rows + day3.count()

    # history is exact post-compaction: one row set per date with data
    hist = AtomicTable(out / "history/http_perf").read(spark)
    dates = sorted({r["record_date"] for r in hist.select("record_date").collect()})
    assert dates == days
    sc = read_report(spark, out, "status_counts", txid=days[2])
    got = sum(r["cnt"] for r in sc.collect())
    exp = int(((truth.category == "access")
               & (truth.event_date == days[2])).sum())
    assert got == exp
