"""Unit checks for relational operators on tiny controlled frames, plus
smoke over the sf0.001 testdata (the oracle gate covers sf0.01 exactly)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from iot_data_pipeline_spark.operators import relational


def test_asof_join_hand_case(spark, tmp_path, sf_dir):
    """As-of semantics on a hand-built frame: latest event at-or-before,
    equal timestamps count, no event → NULL."""
    events = spark.createDataFrame(
        [
            Row(event_id=1, user_id=1, ts=dt.datetime(2024, 1, 1, 10, 0)),
            Row(event_id=2, user_id=1, ts=dt.datetime(2024, 1, 1, 12, 0)),
            Row(event_id=3, user_id=2, ts=dt.datetime(2024, 1, 2, 0, 0)),
        ]
    )
    orders = spark.createDataFrame(
        [
            Row(o_orderkey=10, o_custkey=1, o_orderdate=dt.datetime(2024, 1, 1, 11, 0)),
            Row(o_orderkey=11, o_custkey=1, o_orderdate=dt.datetime(2024, 1, 1, 12, 0)),
            Row(o_orderkey=12, o_custkey=2, o_orderdate=dt.datetime(2024, 1, 1, 0, 0)),
        ]
    )
    # write as parquet tables and run the real operator
    e_path, o_path = str(tmp_path / "events.parquet"), str(tmp_path / "orders.parquet")
    events.write.parquet(e_path)
    orders.write.parquet(o_path)
    # operator reads via load_table; emulate its core logic directly instead
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    orders_side = orders.select(
        "o_orderkey",
        F.col("o_custkey").alias("uid"),
        F.col("o_orderdate").alias("ts"),
        F.lit(None).cast("long").alias("ev_id"),
        F.lit(1).alias("is_order"),
    )
    events_side = events.select(
        F.lit(None).cast("long").alias("o_orderkey"),
        F.col("user_id").alias("uid"),
        "ts",
        F.col("event_id").alias("ev_id"),
        F.lit(0).alias("is_order"),
    )
    w = (
        Window.partitionBy("uid")
        .orderBy("ts", "is_order", "ev_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = {
        r["o_orderkey"]: r["last_event_id"]
        for r in orders_side.unionByName(events_side)
        .withColumn(
            "last_event_id",
            F.last(
                F.when(F.col("is_order") == 0, F.col("ev_id")), ignorenulls=True
            ).over(w),
        )
        .filter(F.col("is_order") == 1)
        .collect()
    }
    assert got == {10: 1, 11: 2, 12: None}


def test_topk_bounded(spark, sf_dir):
    out = relational.win_topk_per_group(spark, sf_dir)
    counts = out.groupBy("o_custkey").count().collect()
    assert all(r["count"] <= 3 for r in counts)


def test_sort_limit_order(spark, sf_dir):
    rows = relational.sort_limit(spark, sf_dir).collect()
    prices = [r["o_totalprice"] for r in rows]
    assert prices == sorted(prices, reverse=True)
    assert len(rows) == 10


def test_rollup_has_grand_total(spark, sf_dir):
    rows = relational.agg_grouping_sets(spark, sf_dir).collect()
    grand = [r for r in rows if r["l_returnflag"] is None and r["l_linestatus"] is None]
    assert len(grand) == 1
    total = relational.agg_count_star(spark, sf_dir).first()["cnt"]
    assert grand[0]["cnt"] == total


def test_approx_distinct_tolerance(spark, sf_dir):
    approx = relational.agg_approx_distinct(spark, sf_dir).first()["approx_users"]
    from iot_data_pipeline_spark.operators._util import table

    exact = table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert abs(approx - exact) / exact <= 0.05


def test_approx_quantiles_bounded(spark, sf_dir):
    from iot_data_pipeline_spark.operators import reshape
    from iot_data_pipeline_spark.operators._util import table

    approx = reshape.agg_approx_quantiles(spark, sf_dir).first()
    exact = (
        table(spark, sf_dir, "lineitem")
        .selectExpr("percentile(l_extendedprice, 0.5) AS p50")
        .first()["p50"]
    )
    assert abs(approx["p50"] - exact) / exact < 0.02


def test_redaction_fires(spark, sf_dir):
    from iot_data_pipeline_spark.operators import llm

    rows = llm.llm_redact(spark, sf_dir).collect()
    assert all(r["email_masked"] and r["phone_masked"] for r in rows)
    assert all(r["no_email_left"] for r in rows)


def test_broadcast_join_plan(spark, sf_dir):
    plan = relational.join_broadcast(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_freq_items_containment(spark, sf_dir):
    """KSP sketch guarantee: every event_type with relative frequency above
    the support threshold appears in the sketch output."""
    from pyspark.sql import functions as F

    from iot_data_pipeline_spark.operators import reshape
    from iot_data_pipeline_spark.operators._util import table

    e = table(spark, sf_dir, "events")
    total = e.count()
    exact = {
        r["event_type"]
        for r in e.groupBy("event_type").count().collect()
        if r["count"] / total > 0.1
    }
    sketch = set(
        reshape.agg_freq_items(spark, sf_dir).first()["freq_event_types"]
    )
    assert exact <= sketch


def test_coalesce_compaction_writes_target_file_count(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from iot_data_pipeline_spark.operators._util import table

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    frag = str(tmp_path / "frag")
    li.repartition(64).write.mode("overwrite").parquet(frag)
    assert len(list(tmp_path.glob("frag/part-*.parquet"))) == 64
    compact = str(tmp_path / "compact")
    spark.read.parquet(frag).coalesce(4).write.mode("overwrite").parquet(compact)
    assert len(list(tmp_path.glob("compact/part-*.parquet"))) == 4
    assert (
        spark.read.parquet(compact).agg(F.sum("l_quantity")).first()[0]
        == li.agg(F.sum("l_quantity")).first()[0]
    )


def test_asof_join_property(spark, tmp_path):
    """Property test driving the REAL join_asof_event through a staged
    micro sf_dir: for random event/order sets (duplicate timestamps, users
    with no events, orders before any event), the result must equal the
    brute-force at-or-before reference — latest ts wins, ties broken by
    highest event_id, no match → NULL."""
    import datetime as dt

    from hypothesis import given, settings
    from hypothesis import strategies as st

    base = dt.datetime(2024, 1, 1)
    case_no = [0]

    @settings(max_examples=8, deadline=None)
    @given(st.data())
    def check(data):
        n_events = data.draw(st.integers(1, 12), label="n_events")
        n_orders = data.draw(st.integers(1, 8), label="n_orders")
        ev = [
            (
                i + 1,
                data.draw(st.integers(1, 3), label=f"e_uid{i}"),
                base + dt.timedelta(minutes=data.draw(st.integers(0, 20), label=f"e_ts{i}")),
            )
            for i in range(n_events)
        ]
        orders = [
            (
                100 + i,
                data.draw(st.integers(1, 4), label=f"o_uid{i}"),  # uid 4: no events
                base + dt.timedelta(minutes=data.draw(st.integers(0, 20), label=f"o_ts{i}")),
            )
            for i in range(n_orders)
        ]
        case_no[0] += 1
        sf = tmp_path / f"sf_{case_no[0]}"
        sf.mkdir()
        spark.createDataFrame(
            [
                Row(
                    event_id=e[0],
                    ts=e[2],
                    user_id=e[1],
                    event_type="t",
                    value=0.0,
                    props="{}",
                )
                for e in ev
            ]
        ).write.parquet(str(sf / "events.parquet"))
        spark.createDataFrame(
            [Row(o_orderkey=o[0], o_custkey=o[1], o_orderdate=o[2]) for o in orders]
        ).write.parquet(str(sf / "orders.parquet"))

        got = {
            r["o_orderkey"]: r["last_event_id"]
            for r in relational.join_asof_event(spark, str(sf)).collect()
        }
        for okey, ouid, ots in orders:
            cands = [(ts, eid) for eid, euid, ts in ev if euid == ouid and ts <= ots]
            expected = max(cands)[1] if cands else None
            assert got[okey] == expected, (okey, got[okey], expected)

    check()


def test_win_ntile_dist_single_row_no_divide_by_zero(spark, sf_dir, tmp_path):
    """percent_rank over a 1-row table is 0.0 — what the builtin and the
    DuckDB oracle return. The closed form (rnk-1)/(n_total-1) must be
    guarded or ANSI mode raises DIVIDE_BY_ZERO (round-3 ADVICE, medium)."""
    from iot_data_pipeline_spark.operators import reshape

    one = spark.read.parquet(f"{sf_dir}/customer.parquet").limit(1)
    one.write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    rows = reshape.win_ntile_dist(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["bal_quartile"] == 1
    assert r["bal_pct_rank"] == 0.0
    assert r["bal_cume_dist"] == 1.0


def test_join_theta_range_banded_equals_bruteforce(spark, tmp_path):
    """Property test for the banded bucket join: on random part tables —
    prices drawn to include exact-boundary band differences (|a−b| = 5.0000,
    where a lost ±1-bucket probe would silently drop pairs) — the banded
    join must return exactly the brute-force all-pairs band predicate."""
    import tempfile

    from hypothesis import given, settings
    from hypothesis import strategies as st

    # prices on a 2.5 grid force many |diff| == 5.0 boundary pairs, plus
    # off-grid cents for generic cases
    price = st.one_of(
        st.integers(0, 40).map(lambda k: k * 2.5),
        st.integers(0, 10000).map(lambda c: c / 100.0),
    )

    @settings(max_examples=10, deadline=None)
    @given(st.lists(st.tuples(price, st.sampled_from(["B1", "B2"])),
                    min_size=2, max_size=25))
    def check(parts):
        from iot_data_pipeline_spark.operators import relational

        rows = [
            Row(
                p_partkey=i,
                p_brand=b,
                p_retailprice=float(p),
                p_name=f"part{i}",
                p_type="t",
                p_size=1,
                p_container="c",
                p_mfgr="m",
                p_comment="x",
            )
            for i, (p, b) in enumerate(parts)
        ]
        tdir = tempfile.mkdtemp(prefix="theta_prop_")
        spark.createDataFrame(rows).write.mode("overwrite").parquet(
            tdir + "/part.parquet"
        )
        got = sorted(
            (r["partkey_a"], r["partkey_b"])
            for r in relational.join_theta_range(spark, tdir).collect()
        )
        from decimal import Decimal

        dp = [Decimal(str(p)).quantize(Decimal("0.0001")) for p, _ in parts]
        want = sorted(
            (i, j)
            for i in range(len(parts))
            for j in range(i + 1, len(parts))
            if parts[i][1] == parts[j][1] and abs(dp[i] - dp[j]) <= 5
        )
        assert got == want

    check()


def test_join_interval_overlap_banded_equals_bruteforce(spark, tmp_path):
    """Property test for the calendar-grid interval join: on random order
    tables whose windows straddle month AND year boundaries (where a
    wrong cell explode or a wrong once-only filter silently drops or
    double-counts pairs), the banded join must return exactly the
    brute-force overlap predicate, each pair exactly once."""
    import datetime as dt

    from hypothesis import given, settings
    from hypothesis import strategies as st

    base = dt.date(2023, 11, 20)  # +0..70 days crosses two month bounds + NYE

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 70)),
            min_size=2,
            max_size=25,
        )
    )
    def check(orders):
        rows = [
            Row(
                o_orderkey=i,
                o_custkey=ck,
                o_orderstatus="O",
                o_totalprice=1.0,
                o_orderdate=dt.datetime.combine(
                    base + dt.timedelta(days=off), dt.time()
                ),
                o_orderpriority="1-URGENT",
            )
            for i, (ck, off) in enumerate(orders)
        ]
        tdir = str(tmp_path / "ivl")
        spark.createDataFrame(rows).write.mode("overwrite").parquet(
            tdir + "/orders.parquet"
        )
        got = sorted(
            (r["a_orderkey"], r["b_orderkey"], r["overlap_days"])
            for r in relational.join_interval_overlap(spark, tdir).collect()
        )
        spans = [
            (
                base + dt.timedelta(days=off),
                base + dt.timedelta(days=off + 3 + i % 11),
            )
            for i, (_, off) in enumerate(orders)
        ]
        want = sorted(
            (
                i,
                j,
                (min(spans[i][1], spans[j][1]) - max(spans[i][0], spans[j][0])).days
                + 1,
            )
            for i in range(len(orders))
            for j in range(i + 1, len(orders))
            if orders[i][0] == orders[j][0]
            and spans[i][0] <= spans[j][1]
            and spans[j][0] <= spans[i][1]
        )
        assert got == want

    check()


def test_q13_join_condition_semantics(spark, tmp_path):
    """Q13's defining subtlety: the priority exclusion is part of the JOIN
    condition, so a customer whose orders are ALL urgent must still appear
    with count 0 (a WHERE-clause filter would silently drop them). Built
    corpus: c1 has only urgent orders, c2 has no orders at all, c3 has two
    countable orders plus one urgent."""
    import datetime

    from iot_data_pipeline_spark.operators import relational

    customers = [
        Row(c_custkey=i, c_name=f"c{i}", c_nationkey=0, c_acctbal=0.0,
            c_mktsegment="B")
        for i in (1, 2, 3)
    ]
    ts = datetime.datetime(1996, 1, 1)
    orders = [
        Row(o_orderkey=10, o_custkey=1, o_orderstatus="O", o_totalprice=1.0,
            o_orderdate=ts, o_orderpriority="1-URGENT"),
        Row(o_orderkey=11, o_custkey=3, o_orderstatus="O", o_totalprice=1.0,
            o_orderdate=ts, o_orderpriority="5-LOW"),
        Row(o_orderkey=12, o_custkey=3, o_orderstatus="O", o_totalprice=1.0,
            o_orderdate=ts, o_orderpriority="2-HIGH"),
        Row(o_orderkey=13, o_custkey=3, o_orderstatus="O", o_totalprice=1.0,
            o_orderdate=ts, o_orderpriority="1-URGENT"),
    ]
    tdir = str(tmp_path / "q13")
    spark.createDataFrame(customers).write.mode("overwrite").parquet(
        tdir + "/customer.parquet"
    )
    spark.createDataFrame(orders).write.mode("overwrite").parquet(
        tdir + "/orders.parquet"
    )
    got = {
        r["c_count"]: r["custdist"]
        for r in relational.sql_entry_tpch_q13(spark, tdir).collect()
    }
    # c1 (all-urgent) and c2 (orderless) both land in the 0-orders bucket
    assert got == {0: 2, 2: 1}


def test_edit_distance_banding_equals_bruteforce(spark, tmp_path):
    """Property test for the deletion-neighborhood join: on random short
    strings (drawn from a 3-letter alphabet to force many near-collisions,
    including equal strings, pure insertions, deletions, substitutions,
    and distance-2 pairs that must NOT appear) the banded join returns
    exactly the brute-force distance-≤1 pair set."""
    from itertools import count

    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abc", min_size=1, max_size=6)
    example_no = count()

    @settings(max_examples=10, deadline=None)
    @given(st.lists(word, min_size=2, max_size=20))
    def check(names):
        from iot_data_pipeline_spark.operators import relational

        rows = [
            Row(s_suppkey=i, s_name=n, s_nationkey=0, s_acctbal=0.0)
            for i, n in enumerate(names)
        ]
        # one subdir per example under the pytest-managed tmp_path so the
        # parquet data is cleaned up with the test (no per-example leak)
        tdir = str(tmp_path / f"ex{next(example_no)}")
        spark.createDataFrame(rows).write.mode("overwrite").parquet(
            tdir + "/supplier.parquet"
        )
        got = sorted(
            (r["suppkey_a"], r["suppkey_b"], r["dist"])
            for r in relational.join_edit_distance(spark, tdir).collect()
        )

        def lev(x, y):
            prev = list(range(len(y) + 1))
            for i, cx in enumerate(x, 1):
                cur = [i]
                for j, cy in enumerate(y, 1):
                    cur.append(
                        min(prev[j] + 1, cur[j - 1] + 1,
                            prev[j - 1] + (cx != cy))
                    )
                prev = cur
            return prev[-1]

        want = sorted(
            (i, j, lev(names[i], names[j]))
            for i in range(len(names))
            for j in range(i + 1, len(names))
            if lev(names[i], names[j]) <= 1
        )
        assert got == want

    check()


def test_partsupp_derivation_invariants(spark, sf_dir):
    """The derived partsupp must keep dbgen's structure: exactly 4 DISTINCT
    suppliers per part (striped across the supplier space), availqty in
    1..9999, supplycost in [1.00, 1000.00), and every suppkey a real
    supplier key."""
    from iot_data_pipeline_spark.operators import relational

    relational._partsupp_views(spark, sf_dir)
    ps = spark.table("partsupp").collect()
    supp_keys = {
        r["s_suppkey"] for r in spark.table("supplier").select("s_suppkey").collect()
    }
    n_parts = spark.table("part").count()
    assert len(ps) == 4 * n_parts
    per_part: dict[int, set[int]] = {}
    for r in ps:
        per_part.setdefault(r["ps_partkey"], set()).add(r["ps_suppkey"])
        assert 1 <= r["ps_availqty"] <= 9999
        assert 1.0 <= r["ps_supplycost"] < 1000.0
        assert r["ps_suppkey"] in supp_keys
    assert all(len(s) == 4 for s in per_part.values())
    assert len(per_part) == n_parts


def test_bloom_prefilter_conservative_under_false_positives(spark):
    """Bloom membership is CONSERVATIVE: with a deliberately undersized
    bitset (m=64, k=2 — false positives guaranteed), every true member
    still passes (no false negatives, the property join correctness rests
    on), some non-members pass (the FP path is genuinely exercised), and
    the filter still rejects a meaningful share of non-members."""
    from pyspark.sql import functions as F

    from iot_data_pipeline_spark.operators import relational as R

    build = spark.range(0, 50, 7).withColumnRenamed("id", "k")
    probe = spark.range(0, 200).withColumnRenamed("id", "k")
    words = R.bloom_filter_words(build, "k", m=64, k=2)
    assert len(words) == 1
    passed = {
        r["k"]
        for r in probe.filter(
            R.bloom_might_contain(F.col("k"), words, k=2)
        ).collect()
    }
    members = {r["k"] for r in build.collect()}
    assert members <= passed, "false negative — Bloom invariant broken"
    assert len(passed) > len(members), "undersized m must force FPs"
    assert len(passed) < 200, "filter must still reject non-members"


def test_bloom_prefilter_plan_reduction_and_exactness(spark, sf_dir):
    """The registered query's plan carries the getbit bitset Filter on the
    probe (lineitem) side BELOW the join; at the default m the prefilter
    passes every true-match row and far fewer than the full table; and the
    final aggregate equals the plain-join aggregate (the oracle shape)."""
    from pyspark.sql import functions as F

    from iot_data_pipeline_spark.operators import relational as R
    from iot_data_pipeline_spark.operators._util import table
    from iot_data_pipeline_spark.plans import executed_plan

    plan = executed_plan(R.join_bloom_prefilter(spark, sf_dir))
    assert "getbit" in plan

    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    build = o.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 300000)
    )
    words = R.bloom_filter_words(build, "o_orderkey")
    total = li.count()
    passed = li.filter(
        R.bloom_might_contain(F.col("l_orderkey"), words)
    ).count()
    exact = li.join(
        build.select("o_orderkey"),
        li.l_orderkey == F.col("o_orderkey"),
        "left_semi",
    ).count()
    assert exact <= passed, "prefilter dropped a true match"
    assert passed < total * 0.25, "prefilter should cut most of the probe"

    got = {
        (r["l_returnflag"], r["l_linestatus"]): (r["n_items"], r["sum_qty"])
        for r in R.join_bloom_prefilter(spark, sf_dir).collect()
    }
    want = {
        (r["l_returnflag"], r["l_linestatus"]): (r["n_items"], r["sum_qty"])
        for r in (
            li.join(build.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.sum(F.col("l_quantity").cast("decimal(18,4)"))
                .cast("double")
                .alias("sum_qty"),
            )
            .collect()
        )
    }
    assert got == want


def test_bloom_autosizing_and_empty_build(spark):
    """m=None sizes the bitset to the build NDV (~10 bits/key, power of
    two, floored at _BLOOM_M, capped at _BLOOM_M_CAP) so a larger build
    side can't saturate the filter into a no-op; an EMPTY build side
    yields an all-zero bitset whose predicate rejects everything —
    matching the empty plain join."""
    from pyspark.sql import functions as F

    from iot_data_pipeline_spark.operators import relational as R

    small = spark.range(100).withColumnRenamed("id", "k")
    words = R.bloom_filter_words(small, "k")
    assert len(words) * 64 == R._BLOOM_M

    big = spark.range(200_000).withColumnRenamed("id", "k")
    words_big = R.bloom_filter_words(big, "k")
    # range, not equality: 10·ndv sits near the 2^21 boundary and the HLL
    # estimate's ~5% rsd may land either side of it — both sizes are correct
    assert R._BLOOM_M_CAP <= len(words_big) * 64 <= 2 * R._BLOOM_M_CAP
    # auto-sized filter keeps FPR useful even at this NDV: a disjoint
    # probe range passes only a small fraction
    probe = spark.range(200_000, 210_000).withColumnRenamed("id", "k")
    fp = probe.filter(R.bloom_might_contain(F.col("k"), words_big)).count()
    assert fp < 10_000 * 0.05, f"FPR too high after auto-sizing ({fp}/10000)"

    empty = spark.range(0).withColumnRenamed("id", "k")
    words_e = R.bloom_filter_words(empty, "k")
    assert all(w == 0 for w in words_e)
    assert probe.filter(R.bloom_might_contain(F.col("k"), words_e)).count() == 0


def test_bloom_broadcast_tier_matches_literal_tier(spark):
    """The Arrow broadcast-variable probe tier must agree BIT-FOR-BIT with
    the codegen literal tier on the same words (positions are the same
    JVM-side xxhash64 either way; only the gather/test site differs), and
    the tier dispatch must route an over-literal-cap bitset through the
    broadcast tier while preserving the no-false-negative contract."""
    from pyspark.sql import functions as F

    from iot_data_pipeline_spark.operators import relational as R

    build = spark.range(0, 3000, 3).withColumnRenamed("id", "k")
    probe = spark.range(0, 6000).withColumnRenamed("id", "k")
    words = R.bloom_filter_words(build, "k", m=1 << 18)
    lit_pass = {
        r["k"]
        for r in probe.filter(R.bloom_might_contain(F.col("k"), words)).collect()
    }
    bc_pass = {
        r["k"]
        for r in probe.filter(
            R.bloom_might_contain_bc(spark, F.col("k"), words)
        ).collect()
    }
    assert bc_pass == lit_pass

    big_words = R.bloom_filter_words(build, "k", m=R._BLOOM_M_CAP * 2)
    pred = R.bloom_prefilter_pred(spark, F.col("k"), big_words)
    passed = {r["k"] for r in probe.filter(pred).collect()}
    members = {r["k"] for r in build.collect()}
    assert members <= passed, "broadcast tier dropped a true member"
    assert len(passed) < 6000, "broadcast tier must still reject"


def test_bloom_chunked_fold_matches_reference_bits(spark):
    """The engine-side chunked binary fold (distinct positions → per-word
    OR → 16 KB blobs via transform+array_join over hex) must reproduce the
    bitset BIT-FOR-BIT against a driver-side reference fold over the same
    JVM-computed positions — including word 63-bit values (sign bit), words
    shared by multiple positions, all-zero chunks (no row collected), and
    multi-chunk bitsets."""
    import numpy as np
    from pyspark.sql import functions as F

    from iot_data_pipeline_spark.operators import relational as R

    build = spark.range(0, 5000, 7).withColumnRenamed("id", "k")
    for m in (1 << 17, 1 << 18):  # 1 and 2 chunks at 2048 words/chunk
        got = R.bloom_filter_bits(build, "k", m=m)
        assert got.dtype == np.uint64 and len(got) == m // 64
        pos_rows = (
            build.select(
                F.explode(
                    F.array(
                        *[
                            F.pmod(F.xxhash64(F.col("k"), F.lit(s)), F.lit(m))
                            for s in range(R._BLOOM_K)
                        ]
                    )
                ).alias("pos")
            )
            .distinct()
            .collect()
        )
        want = np.zeros(m // 64, dtype=np.uint64)
        for r in pos_rows:
            p = int(r["pos"])
            want[p >> 6] |= np.uint64(1) << np.uint64(p & 63)
        assert np.array_equal(got, want), f"chunked fold diverges at m={m}"
    # signed-word wrapper agrees with the unsigned array view
    words = R.bloom_filter_words(build, "k", m=1 << 17)
    assert np.array_equal(
        np.array(words, dtype=np.int64).view(np.uint64),
        R.bloom_filter_bits(build, "k", m=1 << 17),
    )


def test_bloom_explicit_non_power_of_two_m(spark):
    """An explicit m that is a multiple of 64 but whose word count is not a
    multiple of the 2048-word chunk (e.g. 192 Kib -> 3072 words) must build
    correctly: the LAST chunk owns fewer than c words and its tail-padded
    blob is clipped to the destination (review finding, round 8 — this
    crashed with a numpy broadcast ValueError before the clip)."""
    import numpy as np
    from pyspark.sql import functions as F

    from iot_data_pipeline_spark.operators import relational as R

    build = spark.range(0, 4000, 3).withColumnRenamed("id", "k")
    m = 192 * 1024  # 3072 words: chunk 0 full (2048), chunk 1 partial (1024)
    got = R.bloom_filter_bits(build, "k", m=m)
    assert len(got) == m // 64
    pos_rows = (
        build.select(
            F.explode(
                F.array(
                    *[
                        F.pmod(F.xxhash64(F.col("k"), F.lit(s)), F.lit(m))
                        for s in range(R._BLOOM_K)
                    ]
                )
            ).alias("pos")
        )
        .distinct()
        .collect()
    )
    want = np.zeros(m // 64, dtype=np.uint64)
    for r in pos_rows:
        p = int(r["pos"])
        want[p >> 6] |= np.uint64(1) << np.uint64(p & 63)
    assert np.array_equal(got, want)
    # the partial chunk really was exercised
    assert want[2048:].any()


def test_bloom_as_uint64_signed_is_bit_reinterpretation():
    """A signed int64 ndarray (the literal-tier word view) must be BIT
    reinterpreted, not value-converted: astype on negative values relies on
    numpy's value-wrap behavior, which numpy has been tightening (r8 ADVICE).
    """
    import numpy as np

    from iot_data_pipeline_spark.operators.relational import _bloom_as_uint64

    signed = np.array([-1, -(2**63), 0, 7], dtype=np.int64)
    got = _bloom_as_uint64(signed)
    assert got.dtype == np.uint64
    want = np.array([2**64 - 1, 2**63, 0, 7], dtype=np.uint64)
    assert np.array_equal(got, want)
    # view shares the buffer (no copy) — the exact intended reinterpretation
    assert got.base is signed or got is signed
    # already-unsigned input passes through unchanged, also copy-free
    unsigned = np.array([1, 2], dtype=np.uint64)
    out = _bloom_as_uint64(unsigned)
    assert out is unsigned
    # plain Python signed list keeps the documented view semantics
    assert np.array_equal(_bloom_as_uint64([-1]), np.array([2**64 - 1], dtype=np.uint64))


def test_dist_global_rank_property_matches_builtin_window(spark):
    """Property pin for the shared two-pass distributed rank (r13): on
    random frames — duplicates in the order column forced to tie-break on
    the key, sizes straddling the partition count, skewed value ranges —
    (rnk, n_total) and the closed-form ntile must equal the builtin
    row_number()/ntile() over a global window EXACTLY, for ascending and
    descending orders."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from iot_data_pipeline_spark.operators._util import (
        dist_global_rank,
        ntile_closed_form,
    )

    @settings(max_examples=6, deadline=None)
    @given(st.data())
    def check(data):
        n = data.draw(st.integers(1, 200), label="n_rows")
        # small value domain so duplicate order values are common
        vals = [
            data.draw(st.integers(-5, 5), label=f"v{i}") for i in range(n)
        ]
        k = data.draw(st.integers(1, 7), label="k")
        desc = data.draw(st.booleans(), label="desc")
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "id BIGINT, v BIGINT"
        )
        order = (
            [F.col("v").desc(), F.col("id")]
            if desc
            else [F.col("v"), F.col("id")]
        )
        got = {
            r["id"]: (r["rnk"], r["n_total"], r["t"])
            for r in dist_global_rank(df, *order)
            .select("id", "rnk", "n_total", ntile_closed_form(k).alias("t"))
            .collect()
        }
        w = Window.orderBy(*order)
        expected = {
            r["id"]: (r["rnk"], n, r["t"])
            for r in df.select(
                "id",
                F.row_number().over(w).cast("bigint").alias("rnk"),
                F.ntile(k).over(w).cast("bigint").alias("t"),
            ).collect()
        }
        assert got == expected

    check()


def test_dist_global_rank_rejects_reserved_column_collisions(spark):
    """ADVICE r13: dist_global_rank claims _pid/_lrank/_off internally and
    rnk/n_total as outputs — an input frame already carrying one of them
    must be rejected at the seam, not silently overwritten."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from iot_data_pipeline_spark.operators._util import dist_global_rank

    df = spark.range(10).selectExpr("id", "id * 2 AS rnk")
    with _pytest.raises(ValueError, match="reserves column names"):
        dist_global_rank(df, F.col("id"))
    df2 = spark.range(10).selectExpr("id", "id AS _pid")
    with _pytest.raises(ValueError, match="reserves column names"):
        dist_global_rank(df2, F.col("id"))
