"""Enrichment: broadcast lookup joins (J1-J3, SURVEY.md §2.4).

All reference 'joins' are small-dimension in-memory hash probes loaded in the
AWK BEGIN block; here they are explicit ``broadcast()`` equi-joins so the big
fact side never shuffles:

  J1 clone_id -> WAS server        webAccessLogParser.sh:196-201,440
  J2 uri -> baseline ART           webAccessLogParser.sh:216-223,1010-1022
  J3 (metric, scope) -> threshold  webAccessLogParser.sh:183-192 et al.
  route_meta: source -> route/severity class (the north-rule enrich key)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_route_meta(df: DataFrame, route_meta: DataFrame) -> DataFrame:
    """North-rule broadcast enrich keyed on `source` (left: misses keep null)."""
    return df.join(F.broadcast(route_meta), "source", "left")


def enrich_clone(df: DataFrame, clone_map: DataFrame) -> DataFrame:
    """J1: attach was_server/was_host via clone_id (left-outer: miss -> null,
    matching the empty-string AWK miss semantics)."""
    return df.join(F.broadcast(clone_map), "clone_id", "left")


def baseline_deviation(uri_agg: DataFrame, perf_baseline: DataFrame,
                       art_col: str = "art") -> DataFrame:
    """J2: per-URI average response time vs baseline + deviation%.

    Mirrors webAccessLogParser.sh:1010-1022: diff = art - baseline,
    deviation% = diff/baseline*100 (guarded for missing baselines).
    """
    bl = perf_baseline.select(F.col("uri").alias("bl_uri"), "baseline_art")
    out = uri_agg.join(F.broadcast(bl), uri_agg["uri"] == bl["bl_uri"], "left")
    art = F.col(art_col)
    return (
        out.withColumn("baseline_diff", F.round(art - F.col("baseline_art"), 6))
        .withColumn(
            "baseline_dev_pct",
            F.when(
                F.col("baseline_art").isNotNull() & (F.col("baseline_art") != 0),
                F.round((art - F.col("baseline_art")) / F.col("baseline_art") * 100.0, 2),
            ),
        )
        .drop("bl_uri")
    )


def threshold_map(thresholds: DataFrame) -> DataFrame:
    """J3 build side: last-wins dedup per (property, target) — AWK overwrite
    semantics for duplicate keys in thresholdValues.csv."""
    from pyspark.sql import Window

    w = Window.partitionBy("property", "target").orderBy(F.monotonically_increasing_id().desc())
    return (
        thresholds.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
