"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line with per-query seconds.

Each query is forced with a noop-format write (full computation, no driver
collect, no sink I/O) so the number measures the engine, not the harness.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# Headline set: one representative per operator family, weighted toward the
# shuffle/join/agg-heavy plans that dominate at scale.
HEADLINE = [
    "project_cast_arith",
    "sql_entry_tpch_q3",
    "join_multiway",
    "join_asof_event",
    "agg_groupby_label",
    "win_topk_per_group",
    "sort_limit",
    "udtf_explode",
    "llm_dedup_exact",
    "llm_dedup_near",
    "llm_sim_topk",
    "mm_feature_extract",
    "stream_tumbling_agg",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("iot_data_pipeline_spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    # Warmup at the smallest SF: spins up the Python-worker pool, compiles
    # codegen templates, and primes the file-listing caches so the measured
    # numbers are engine throughput, not JVM cold-start.
    warm_dir = "/root/testdata/sf0.001"
    for name in HEADLINE:
        try:
            qs[name](spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
