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
