"""Pure-column expressions: response-time bucketing (P8), K/M/G unit
normalization (P16), static-content exclusion (F4) — all JVM-side/codegen,
no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from . import patterns

# response-time range labels, webAccessLogParser.sh:134,465-481
# boundaries are INCLUSIVE upper bounds: <=1, <=5, <=10, <=20, >20 seconds.
RANGE_LABELS = ["<=1Sec", "<=5Sec", "<=10Sec", "<=20Sec", ">20Sec"]
RANGE_BOUNDS = [1.0, 5.0, 10.0, 20.0]


def resp_range(rt_sec: Column) -> Column:
    """Bucket response time (seconds) into the reference's 5 labels."""
    c = F.when(rt_sec <= RANGE_BOUNDS[0], RANGE_LABELS[0])
    for lo_idx in range(1, len(RANGE_BOUNDS)):
        c = c.when(rt_sec <= RANGE_BOUNDS[lo_idx], RANGE_LABELS[lo_idx])
    return c.otherwise(RANGE_LABELS[-1])


def bucket_py(rt_sec: float) -> str:
    """Python twin of resp_range (test/property oracle)."""
    for bound, label in zip(RANGE_BOUNDS, RANGE_LABELS):
        if rt_sec <= bound:
            return label
    return RANGE_LABELS[-1]


def resp_range_sql(expr: str) -> str:
    """Same bucketing as ANSI SQL (for DuckDB oracles)."""
    return (
        f"CASE WHEN {expr} <= 1.0 THEN '<=1Sec' "
        f"WHEN {expr} <= 5.0 THEN '<=5Sec' "
        f"WHEN {expr} <= 10.0 THEN '<=10Sec' "
        f"WHEN {expr} <= 20.0 THEN '<=20Sec' "
        f"ELSE '>20Sec' END"
    )


def to_kb(value: Column, unit: Column) -> Column:
    """Normalize a (value, K|M|G) pair to kilobytes — javaGCStatsParser.sh:361-403."""
    return (
        F.when(unit == "K", value)
        .when(unit == "M", value * 1024)
        .when(unit == "G", value * 1024 * 1024)
        .otherwise(value / 1024)  # bare bytes
        .cast("double")
    )


def is_excluded_static(status: Column, ext: Column, uri: Column, params: Column) -> Column:
    """F4 static-content exclusion gate, webAccessLogParser.sh:742.

    True = row EXCLUDED from the 'xcl' (dynamic-content) aggregates:
    304s, static extensions, styling .xhtml resources, Wily metric pings.
    """
    return (
        (status == 304)
        | ext.rlike(patterns.STATIC_EXT)
        | uri.rlike(patterns.XCL_URI)
        | params.rlike(patterns.XCL_PARAMS)
    )
