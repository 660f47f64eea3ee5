"""spark-submit entry point.

Mirrors the reference CLI (usage.sh:59-198): record date, report type,
processing option, source selection — re-expressed for a table-based input.

Cluster usage (north rule "spark-submit --py-files on a multi-executor
cluster"):

    zip -r log_parser_spark.zip log_parser_spark
    spark-submit --master yarn --deploy-mode cluster \
        --py-files log_parser_spark.zip \
        main.py --dataset /warehouse/tokenlog --out /warehouse/reports \
                --recorddate 2015-06-13 --rpttype all

Locally:

    python main.py --dataset data/tokenlog/sf0.01 --out /tmp/rpt
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="log-parser-spark",
        description="PySpark log/telemetry parse→enrich→route→aggregate engine",
    )
    p.add_argument("--dataset", required=True,
                   help="token_sequences dataset dir (Iceberg table path in prod)")
    p.add_argument("--out", required=True, help="output/report root")
    p.add_argument("--recorddate", default="2015-06-13",
                   help="record date to summarize (usage.sh -d)")
    p.add_argument("--rpttype", default="all",
                   choices=["all", "web", "was", "err", "gc"],
                   help="report family to produce (usage.sh -t)")
    p.add_argument("--sources", nargs="*", default=None,
                   help="source hosts to include (partition pruning; usage.sh -c rootcontext)")
    p.add_argument("--procoption", default="daily", choices=["daily", "ondemand"],
                   help="daily appends history tables; ondemand skips (usage.sh -p)")
    p.add_argument("--cores", default=None, help="local[N] cores (default: env/SPARK_GRAFT_CPUS)")
    p.add_argument("--num-partitions", type=int, default=0,
                   help=">0 enables salted repartition before the sink write")
    p.add_argument("--render", action="store_true",
                   help="also write the NN_*SummaryRpt.txt text reports")
    p.add_argument("--maintain", action="store_true",
                   help="after the run, compact every snapshot table under "
                        "--out (bin-pack small files, keep partition layout) "
                        "and expire the replaced snapshots — the daily "
                        "maintenance job a long-lived 100 TB table needs")
    p.add_argument("--target-file-mb", type=int, default=128,
                   help="compaction target file size (with --maintain)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from log_parser_spark.plans.pipeline import run_pipeline
    from log_parser_spark.session import get_spark

    spark = get_spark(cores=args.cores, app_name=f"log-parser-{args.rpttype}")
    res = run_pipeline(
        spark,
        args.dataset,
        args.out,
        recorddate=args.recorddate,
        sources=args.sources,
        num_partitions=args.num_partitions,
        rpttype=args.rpttype,
        procoption=args.procoption,
    )
    rendered = []
    if args.render and args.rpttype == "all":
        from log_parser_spark.reports import render_all

        rendered = [str(p) for p in
                    render_all(args.out, res.reports, args.recorddate)]
    maintenance = {}
    if args.maintain:
        from pathlib import Path

        from log_parser_spark.sources.atomic import AtomicTable

        for mf in sorted(Path(args.out).rglob("_manifest.jsonl")):
            t = AtomicTable(mf.parent)
            rec = t.compact(
                spark, f"maint-{args.recorddate}",
                target_file_bytes=args.target_file_mb * 1024 * 1024,
                partition_by=t.partition_columns() or None,
            )
            expired = t.expire_snapshots() if rec else []
            maintenance[str(mf.parent.relative_to(args.out))] = {
                "compacted": rec is not None,
                "expired_snapshots": len(expired),
                "live_files": t.file_stats()["files"],
            }
    print(json.dumps({
        **({"rendered": rendered} if rendered else {}),
        **({"maintenance": maintenance} if maintenance else {}),
        "rows_in": res.rows_in,
        "sink_counts": res.sink_counts,
        "committed": len(res.committed),
        "skipped": len(res.skipped),
        "elapsed_s": round(res.elapsed_s, 2),
        "out": str(res.out_dir),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
