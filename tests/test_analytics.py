"""Consistency properties for the event-analytics operators (the oracle
gate proves value equality; these pin the semantic invariants)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_data_pipeline_spark.operators import analytics
from iot_data_pipeline_spark.operators._util import table


def test_latest_snapshot_one_row_per_user_at_max_ts(spark, sf_dir):
    snap = analytics.evt_latest_snapshot(spark, sf_dir)
    e = table(spark, sf_dir, "events")
    n_users = e.select("user_id").distinct().count()
    assert snap.count() == n_users
    # every snapshot ts is that user's max ts
    mx = e.groupBy("user_id").agg(F.max("ts").alias("max_ts"))
    bad = snap.join(mx, "user_id").filter(F.col("ts") != F.col("max_ts"))
    assert bad.count() == 0


def test_active_windows_sweep_invariants(spark, sf_dir):
    rows = analytics.evt_active_windows(spark, sf_dir).orderBy("day").collect()
    assert rows
    # counts are non-negative and the first day opens at least one window
    assert all(r["open_windows"] >= 0 for r in rows)
    assert rows[0]["open_windows"] >= 1
    # a window spans 3 days, so the count can move by at most the day's
    # opens/closes: sanity-check total window-days == 3 * n_windows minus
    # the tail truncated past the spine end
    n_windows = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .count()
    )
    total_open_days = sum(r["open_windows"] for r in rows)
    assert total_open_days <= 3 * n_windows
    assert total_open_days >= 3 * (n_windows - 2)  # only the last 2 spine
    # days can truncate windows


def test_cumulative_users_reaches_total(spark, sf_dir):
    rows = (
        analytics.evt_cumulative_users(spark, sf_dir).orderBy("day").collect()
    )
    e = table(spark, sf_dir, "events")
    total = e.select("user_id").distinct().count()
    assert rows[-1]["cum_users"] == total
    # monotone non-decreasing, and new_users sums to the total
    cums = [r["cum_users"] for r in rows]
    assert cums == sorted(cums)
    assert sum(r["new_users"] for r in rows) == total
