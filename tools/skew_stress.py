"""Forced-skew writer stress: measure sink fan-out task balance with and
without the salted repartition (SURVEY.md §4; VERDICT r2 item 9).

The routed sink write shuffles on its partition key; with a hot category
(~70% access) plus a forced-hot source, a naive `repartition("category")`
gives ONE writer task the bulk of the corpus. `route.salted` spreads each
category over (category, salt) so writer tasks stay balanced — this tool
turns that claim into a measured task-time histogram at bench scale.

Method: build a deterministic skewed variant of the tokenlog token table
(a hash-chosen `hot_pct`% of docs re-homed to the hot source, the
reference's webhost010), then run the identical scan → fused parse →
shuffle → partitionBy(category) parquet write twice — once shuffling on
bare `category`, once salted — with the Spark UI REST API on, and read
the write stage's per-task durations plus the rows-per-partition spread.

Run directly (`python tools/skew_stress.py [sf] [hot_pct]`) or via
bench.py, which embeds the result JSON under "skew_stress".
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
import urllib.request
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def ensure_skewed_dataset(sf: float, hot_pct: int = 80) -> Path:
    """Materialize-once skewed variant: hot_pct% of docs on the hot source."""
    from pyspark.sql import functions as F

    from log_parser_spark import datagen
    from log_parser_spark.session import get_spark

    base = datagen.ensure_dataset(sf)
    out = base.parent / f"sf{sf:g}-skew{hot_pct}"
    marker = out / "_SUCCESS"
    if marker.exists():
        return out
    spark = get_spark(cores=8, app_name="skew-datagen", shuffle_partitions=8)
    (
        spark.read.parquet(str(base / "token_sequences"))
        .withColumn(
            "source",
            F.when(
                F.pmod(F.xxhash64("doc_id"), F.lit(100)) < hot_pct,
                F.lit(datagen.HOT_SOURCE),
            ).otherwise(F.col("source")),
        )
        .write.mode("overwrite")
        .partitionBy("source")
        .parquet(str(out / "token_sequences"))
    )
    spark.stop()
    marker.write_text(f"skew of sf={sf} hot_pct={hot_pct}\n")
    return out


def _rest(ui_url: str, path: str):
    with urllib.request.urlopen(f"{ui_url}/api/v1/{path}", timeout=10) as r:
        return json.loads(r.read())


def _write_stage_task_ms(spark, num_partitions: int) -> list[float]:
    """Per-task durations (ms) of the completed write stage — the stage
    whose task count equals the pre-write shuffle's partition count."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    stages = _rest(ui, f"applications/{app}/stages?status=COMPLETE")
    cand = [s for s in stages if s["numCompleteTasks"] == num_partitions]
    stage = max(cand, key=lambda s: s["stageId"])
    tasks = _rest(
        ui,
        f"applications/{app}/stages/{stage['stageId']}/"
        f"{stage['attemptId']}/taskList?length={num_partitions + 8}",
    )
    return [t["duration"] for t in tasks if "duration" in t]


def _one_mode(mode: str, data_dir: Path, num_partitions: int, cores: int) -> dict:
    from pyspark.sql import functions as F

    from log_parser_spark.operators.parse import fused_parse
    from log_parser_spark.operators.route import SINK_COLUMNS, salted
    from log_parser_spark.session import get_spark
    from log_parser_spark.sources.token_table import read_token_sequences

    spark = get_spark(
        cores=cores,
        app_name=f"skew-{mode}",
        shuffle_partitions=num_partitions,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4050",
            # fixed partitioning is the experiment variable — don't let AQE
            # re-coalesce the shuffle we're measuring
            "spark.sql.adaptive.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    parsed = fused_parse(read_token_sequences(spark, data_dir)).select(*SINK_COLUMNS)
    if mode == "salted":
        df = salted(parsed, num_partitions, "category")
    else:
        df = parsed.repartition(num_partitions, F.col("category"))

    rows_per_part = [
        r["cnt"]
        for r in df.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    ]
    out = tempfile.mkdtemp(prefix=f"skew_{mode}_")
    t0 = time.time()
    df.write.mode("overwrite").partitionBy("category").parquet(out)
    wall = time.time() - t0
    task_ms = sorted(_write_stage_task_ms(spark, num_partitions))
    spark.stop()
    shutil.rmtree(out, ignore_errors=True)

    rp = np.array(sorted(rows_per_part) + [0] * (num_partitions - len(rows_per_part)))
    tm = np.array(task_ms, dtype=float)
    q = lambda a, p: float(np.percentile(a, p)) if len(a) else 0.0  # noqa: E731
    return {
        "wall_s": round(wall, 2),
        "rows": int(rp.sum()),
        "nonempty_partitions": int((rp > 0).sum()),
        "rows_per_partition": {
            "min": int(rp.min()), "p50": int(q(rp, 50)), "max": int(rp.max()),
            "max_share_pct": round(float(rp.max()) / float(rp.sum()) * 100, 1),
        },
        "write_task_ms": {
            "n": len(tm), "min": round(float(tm.min()), 0) if len(tm) else 0,
            "p50": round(q(tm, 50), 0), "p95": round(q(tm, 95), 0),
            "max": round(float(tm.max()), 0) if len(tm) else 0,
            "max_over_p50": round(float(tm.max()) / max(q(tm, 50), 1.0), 2)
            if len(tm) else 0,
        },
    }


def run_skew_stress(
    sf: float = 1.0, hot_pct: int = 80, num_partitions: int = 32, cores: int = 8
) -> dict:
    data_dir = ensure_skewed_dataset(sf, hot_pct)
    res = {
        "sf": sf,
        "hot_pct": hot_pct,
        "num_partitions": num_partitions,
        "unsalted": _one_mode("unsalted", data_dir, num_partitions, cores),
        "salted": _one_mode("salted", data_dir, num_partitions, cores),
    }
    res["writer_speedup"] = round(
        res["unsalted"]["wall_s"] / max(res["salted"]["wall_s"], 1e-9), 2
    )
    return res


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    hot = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    print(json.dumps(run_skew_stress(sf, hot)))
