"""Salting helpers must be result-identical to the unsalted plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_data_pipeline_spark.operators import skew
from iot_data_pipeline_spark.operators._util import table


def _sorted(rows):
    return sorted(tuple(r) for r in rows)


def test_salted_count_matches(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    plain = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("cnt"))
    salted = skew.salted_count(li, "l_returnflag")
    assert _sorted(plain.collect()) == _sorted(salted.collect())


def test_salted_sum_matches(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    plain = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,4)"))
        .cast("double")
        .alias("total")
    )
    salted = skew.salted_sum(li, "l_returnflag", "l_quantity")
    assert _sorted(plain.collect()) == _sorted(salted.collect())


def test_salted_join_matches(spark, sf_dir):
    # events.user_id is the "skewed" key; customer is the non-broadcast side.
    e = table(spark, sf_dir, "events").select(
        F.col("user_id").alias("c_custkey"), "event_id"
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    plain = e.join(c, "c_custkey").select("event_id", "c_custkey", "c_name")
    salted = skew.salted_join(e, c, "c_custkey").select(
        "event_id", "c_custkey", "c_name"
    )
    assert _sorted(plain.collect()) == _sorted(salted.collect())


def test_bounded_topk_matches_plain_window_on_hot_key(spark):
    # Synthetic hot key: key 1 holds 60% of rows; ranks must be identical to
    # the plain window top-k under any partitioning of the input.
    from pyspark.sql import Window

    rows = [(i, 1 if i % 5 < 3 else (i % 7) + 2, float(i % 97)) for i in range(2000)]
    df = (
        spark.createDataFrame(rows, ["id", "key", "score"])
        .repartition(8)  # several input partitions -> several partial groups
    )
    order = [F.col("score").desc(), F.col("id")]
    plain = (
        df.withColumn("rn", F.row_number().over(Window.partitionBy("key").orderBy(*order)))
        .where(F.col("rn") <= 3)
        .select("key", "id", "rn")
    )
    bounded = skew.bounded_topk(df, "key", order, k=3).select("key", "id", "rn")
    assert _sorted(plain.collect()) == _sorted(bounded.collect())


def test_bounded_topk_prune_bounds_the_global_window_input(spark):
    # The partial phase must cap what reaches the global window at
    # k rows per (key, input partition) — the whole point of the shape.
    rows = [(i, 1, float(i)) for i in range(5000)]  # ONE key owns everything
    df = spark.createDataFrame(rows, ["id", "key", "score"]).repartition(8)
    k = 3
    n_parts = df.rdd.getNumPartitions()
    part = df.withColumn("_p", F.spark_partition_id())
    from pyspark.sql import Window

    wp = Window.partitionBy("key", "_p").orderBy(F.col("score").desc(), F.col("id"))
    pruned = part.withColumn("_rn", F.row_number().over(wp)).where(F.col("_rn") <= k)
    assert pruned.count() <= k * n_parts
    # and the end-to-end result is still exactly the global top-k
    got = _sorted(
        skew.bounded_topk(df, "key", [F.col("score").desc(), F.col("id")], k=k)
        .select("key", "id", "rn")
        .collect()
    )
    assert got == [(1, 4999 - r, r + 1) for r in reversed(range(k))]


def test_skew_topk_bounded_registered_query(spark, sf_dir):
    # Registered entry agrees with the plain-window oracle shape on testdata.
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    plain = (
        e.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.col("ts").desc(), F.col("event_id")
                )
            ),
        )
        .where(F.col("rn") <= 3)
        .select("user_id", "event_id", "rn")
    )
    got = skew.skew_topk_bounded(spark, sf_dir)
    assert _sorted(plain.collect()) == _sorted(got.collect())


def test_bounded_topk_rejects_colliding_columns(spark):
    # rn is the output contract; __btk_* are internals — silent overwrite of
    # caller data is worse than an error (review finding, round 8).
    import pytest

    df = spark.createDataFrame([(1, 1, 1.0)], ["id", "key", "rn"])
    with pytest.raises(ValueError, match="rn"):
        skew.bounded_topk(df, "key", [F.col("id")], k=1)
