"""SQL surface: register the engine's tables as temp views so every report
is also writable as plain ``spark.sql`` (DataFrame and SQL are the same
Catalyst plans — SURVEY.md §4).

Usage::

    from log_parser_spark import sql as lsql
    lsql.register_views(spark, sinks_dir, lookups_dir)
    spark.sql(lsql.CANNED["status_counts"]).show()
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import SparkSession

from .operators.parse import parsed_family
from .sources.atomic import AtomicTable
from .sources.token_table import read_all_lookups


def register_views(
    spark: SparkSession,
    sinks_dir: str | Path,
    dataset_dir: str | Path | None = None,
) -> list[str]:
    """Create temp views over the committed silver sinks: one per family
    (`access`, `was_events`, `weberror`, `gc_events`), the raw routed table
    (`routed`), and the lookup dimensions when dataset_dir is given."""
    sinks = AtomicTable(sinks_dir).read(spark)
    if sinks is None:
        raise ValueError(f"no committed sinks under {sinks_dir}")
    views = []
    sinks.createOrReplaceTempView("routed")
    views.append("routed")
    for fam, view in [("access", "access"), ("was", "was_events"),
                      ("weberror", "weberror"), ("gc", "gc_events")]:
        parsed_family(sinks, fam).createOrReplaceTempView(view)
        views.append(view)
    if dataset_dir is not None:
        for name, df in read_all_lookups(spark, dataset_dir).items():
            df.createOrReplaceTempView(name)
            views.append(name)
    return views


# Canned SQL renditions of reference reports — same results as the
# DataFrame operators (asserted in tests/test_sql_surface.py).
CANNED: dict[str, str] = {
    # A1 — webAccessLogParser.sh:723,1176-1184
    "status_counts": """
        SELECT status, COUNT(*) AS cnt,
               ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER () * 100.0, 2) AS pct
        FROM access WHERE category = 'access'
        GROUP BY status ORDER BY status
    """,
    # A2 — uri stats with min/max/avg
    "uri_stats": """
        SELECT uri_path, COUNT(*) AS cnt,
               ROUND(AVG(rt), 6) AS art, MIN(rt) AS min_rt, MAX(rt) AS max_rt
        FROM access WHERE category = 'access'
        GROUP BY uri_path ORDER BY uri_path
    """,
    # A14/T3 — 400+ errors by URL
    "errors_by_uri": """
        SELECT uri_path, status, COUNT(*) AS cnt
        FROM access WHERE category = 'access' AND status >= 400
        GROUP BY uri_path, status ORDER BY cnt DESC, uri_path LIMIT 10
    """,
    # A16 — WAS event counts by server and severity
    "was_events_by_server": """
        SELECT source, evt, COUNT(*) AS cnt
        FROM was_events GROUP BY source, evt ORDER BY source, evt
    """,
    # A22 — GC per-JVM daily stats
    "gc_daily": """
        SELECT source AS jvm, event_date,
               COUNT(*) FILTER (WHERE gc_type = 'GC') AS gc_cnt,
               COUNT(*) FILTER (WHERE gc_type <> 'GC') AS fgc_cnt,
               ROUND(SUM(real_s), 2) AS real_s_total
        FROM gc_events GROUP BY source, event_date ORDER BY jvm, event_date
    """,
    # routed-row accounting (north rule)
    "sink_counts": """
        SELECT category, COUNT(*) AS cnt FROM routed
        GROUP BY category ORDER BY category
    """,
}
