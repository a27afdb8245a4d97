"""r17 stage-level timeline for join_bloom_prefilter (VERDICT r16 item 5):
time the query's three driver-visible phases separately — (1) the NDV
auto-sizing aggregate, (2) the bitset build+collect, (3) the prefiltered
join+aggregate (noop sink) — under the bench-identical session, so the
32-core anti-scaling (PERF_r16: 0.78 ratio vs 8 cores) can be attributed
to a phase instead of hand-waved.

Usage: SPARK_GRAFT_CPUS=32 python tools_bloom_probe_r17.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r17-bloom-probe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from iot_data_pipeline_spark.operators._util import dec, dsum, dsum_prod, table
    from iot_data_pipeline_spark.operators.relational import (
        _BLOOM_M,
        bloom_filter_bits,
        bloom_prefilter_pred,
    )

    # warmup (small sf) so JVM/codegen cold-start is out of the numbers
    warm = "/root/testdata/sf0.001"
    for d in (warm, sf_dir):
        o = table(spark, d, "orders")
        o.agg(F.approx_count_distinct("o_orderkey")).collect()

    for rep in range(reps):
        o = table(spark, sf_dir, "orders")
        li = table(spark, sf_dir, "lineitem")
        build = o.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 300000)
        )
        t0 = time.time()
        ndv = build.agg(F.approx_count_distinct("o_orderkey").alias("n")).first()["n"]
        t1 = time.time()
        m = _BLOOM_M
        while m < min(10 * max(int(ndv), 1), 1 << 30):
            m *= 2
        bits = bloom_filter_bits(build, "o_orderkey", m=m)
        t2 = time.time()
        pre = li.filter(bloom_prefilter_pred(spark, F.col("l_orderkey"), bits))
        one = F.lit(1).cast("decimal(18,4)")
        q = (
            pre.join(
                build.select("o_orderkey"), pre.l_orderkey == F.col("o_orderkey")
            )
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                dsum("l_quantity", "sum_qty"),
                dsum_prod(
                    dec("l_extendedprice") * (one - dec("l_discount")), "revenue"
                ),
            )
        )
        q.write.format("noop").mode("overwrite").save()
        t3 = time.time()
        print(
            f"rep{rep}: ndv_agg={t1-t0:.3f}s bitset_build={t2-t1:.3f}s "
            f"join_agg_noop={t3-t2:.3f}s total={t3-t0:.3f}s (ndv={ndv}, m={m})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
