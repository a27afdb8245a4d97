"""Reshaping + additional source/sink coverage: pivot/unpivot, range-frame
windows, CSV/JSON round trips, partitioned writes, schema introspection.

These extend SURVEY.md §2B beyond the minimum inventory — operators a user
of the reference's ClickHouse serving layer would reach for next, each with
a DuckDB oracle.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iot_data_pipeline_spark.operators._util import dec, table

# ---------------------------------------------------------------------------
# Reshaping
# ---------------------------------------------------------------------------


def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order counts: priorities × fixed status values. The explicit
    value list keeps the schema static (no extra distinct-scan job, and a
    stable contract at any scale); absent combinations coalesce to 0 to
    match SQL's COUNT FILTER semantics."""
    o = table(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
    )


def set_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) lineitem measures into (metric, value) long form —
    the inverse reshape, one narrow pass (no shuffle)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    ).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice"],
        "metric",
        "value",
    )


def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per customer, rolling 30-day spend ending at each
    order (value-based frame, not row-count) — ordered by epoch seconds so
    the frame bound is numeric and identical in both engines."""
    o = table(spark, sf_dir, "orders")
    # o_orderdate is TIMESTAMP_NTZ (parquet ms, no tz); route through an
    # LTZ cast (identity wall-clock under the pinned UTC session) to get
    # epoch seconds — matching DuckDB's epoch().
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("spend_30d"),
    )


def meta_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema introspection (reference Q2: printSchema / DESCRIBE TABLE):
    column name + Spark SQL type of the lineitem table as rows."""
    li = table(spark, sf_dir, "lineitem")
    return spark.createDataFrame(
        [(i, n, t) for i, (n, t) in enumerate(li.dtypes)],
        "ordinal INT, col_name STRING, data_type STRING",
    )


def meta_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling scan (describe/summary analog, reference Q2 extended):
    per-column non-null count, distinct count, numeric min/max, string
    min/max — all columns profiled in ONE pass over the table (a single
    wide aggregate reshaped to long form), not one job per column."""
    c = table(spark, sf_dir, "customer")
    num_cols = ["c_custkey", "c_nationkey", "c_acctbal"]
    str_cols = ["c_name", "c_mktsegment"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for col in num_cols + str_cols:
        aggs += [
            F.count(col).alias(f"{col}__nn"),
            F.countDistinct(col).alias(f"{col}__nd"),
        ]
    for col in num_cols:
        aggs += [
            F.min(F.col(col).cast("double")).alias(f"{col}__min"),
            F.max(F.col(col).cast("double")).alias(f"{col}__max"),
        ]
    for col in str_cols:
        aggs += [F.min(col).alias(f"{col}__smin"), F.max(col).alias(f"{col}__smax")]
    wide = c.agg(*aggs)
    rows = []
    for col in num_cols:
        rows.append(
            F.struct(
                F.lit(col).alias("col_name"),
                F.col(f"{col}__nn").alias("n_nonnull"),
                F.col(f"{col}__nd").alias("n_distinct"),
                F.col(f"{col}__min").alias("min_num"),
                F.col(f"{col}__max").alias("max_num"),
                F.lit(None).cast("string").alias("min_str"),
                F.lit(None).cast("string").alias("max_str"),
            )
        )
    for col in str_cols:
        rows.append(
            F.struct(
                F.lit(col).alias("col_name"),
                F.col(f"{col}__nn").alias("n_nonnull"),
                F.col(f"{col}__nd").alias("n_distinct"),
                F.lit(None).cast("double").alias("min_num"),
                F.lit(None).cast("double").alias("max_num"),
                F.col(f"{col}__smin").alias("min_str"),
                F.col(f"{col}__smax").alias("max_str"),
            )
        )
    return wide.select(
        F.explode(F.array(*rows)).alias("p"), F.col("n_rows")
    ).select("p.*", "n_rows")


def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product of two small dimensions (region × nation)
    — the one join shape that must stay confined to broadcastable inputs."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_regionkey", "r_name", "n_nationkey", "n_name")


def agg_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based quantiles (approx_percentile / Greenwald-Khanna): the
    fixed-memory path for percentiles at 100 TB. rows-only oracle
    (approximation is engine-specific); the test bounds the error vs the
    exact median."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("p50"),
        F.percentile_approx("l_extendedprice", 0.95, 1000).alias("p95"),
        F.percentile_approx("l_extendedprice", 0.99, 1000).alias("p99"),
    )


def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): customers whose
    nation key is masked to NULL still match the dimension's explicit
    unknown row — the lookup-with-fallback shape plain equi-joins can't
    express."""
    c = table(spark, sf_dir, "customer").withColumn(
        "nk", F.nullif(F.col("c_nationkey"), F.lit(3))
    )
    n = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk"), F.col("n_name")
    )
    unknown = spark.createDataFrame(
        [(None, "UNKNOWN")], "nk INT, n_name STRING"
    )
    dim = n.unionByName(unknown)
    return c.join(dim, c.nk.eqNullSafe(dim.nk)).select(
        "c_custkey", "c_nationkey", "n_name"
    )


def fn_string_suite2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string batch: pad/repeat/reverse/translate/left/right/strpos."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("brand_lpad"),
        F.rpad("p_brand", 12, ".").alias("brand_rpad"),
        F.repeat(F.lit("ab"), 3).alias("rep"),
        F.reverse("p_brand").alias("brand_rev"),
        F.translate("p_type", "AEIOU", "aeiou").alias("type_tr"),
        F.substring("p_name", 1, 3).alias("name_left"),
        F.instr("p_type", "ED").alias("ed_pos"),
    )


def win_lag_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead with explicit defaults (no NULL at partition edges) and a
    2-step offset."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.lag("o_totalprice", 2, 0.0).over(w).alias("prev2_price"),
        F.lead("o_totalprice", 1, -1.0).over(w).alias("next_price"),
    )


def agg_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation null semantics over a frame with REAL nulls (outer
    join): COUNT(*) counts rows, COUNT(col) skips nulls, SUM/AVG ignore
    nulls, and an all-null group sums to NULL — the SQL rules everyone
    trips on once."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000.0)
    j = c.join(o, c.c_custkey == o.o_custkey, "left")
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_orderkey").alias("n_big_orders"),
        F.sum(dec("o_totalprice")).cast("double").alias("sum_big"),
        (
            F.sum(dec("o_totalprice")).cast("double") / F.count("o_totalprice")
        ).alias("avg_big"),
    )


def win_pct_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each order's share of its customer's total spend —
    decimal-exact numerator and denominator, one double division."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    total = F.sum(dec("o_totalprice")).over(w).cast("double")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") / total, 6).alias("pct_of_cust"),
    )


def agg_arg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by / max_by (argmin/argmax aggregates) keyed on the UNIQUE order
    key, so the selected rows are deterministic in both engines."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderdate", "o_orderkey").alias("latest_key_date"),
        F.min_by("o_orderdate", "o_orderkey").alias("earliest_key_date"),
        F.max_by("o_totalprice", "o_orderkey").alias("latest_key_price"),
    )


def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (bool_and / bool_or / count_if combinations) per
    line status."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive_qty"),
        F.bool_or(F.col("l_discount") > 0.05).alias("any_big_discount"),
        F.bool_and(F.col("l_tax") < 0.09).alias("all_low_tax"),
    )


def gen_date_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine dimension generation: a calendar table from a date
    sequence + explode (no input scan at all) — the standard way to mint
    date/time dimensions beside the fact tables."""
    days = F.sequence(
        F.lit("2024-01-01").cast("date"),
        F.lit("2024-03-31").cast("date"),
        F.expr("INTERVAL 1 DAY"),
    )
    return (
        spark.range(1)
        .select(F.explode(days).alias("d"))
        .select(
            F.col("d"),
            F.year("d").alias("y"),
            F.month("d").alias("m"),
            F.dayofmonth("d").alias("dom"),
            F.date_format("d", "yyyy-MM").alias("ym"),
            (F.dayofweek("d").isin(1, 7)).alias("is_weekend"),
        )
    )


def agg_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles (median + p90 of order value per
    priority) — the sort-based exact path; the sketch path for unbounded
    cardinality is agg_approx_quantiles."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
        F.count(F.lit(1)).alias("n"),
    )


def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-preceding frame: 4-row moving average of order totals per
    customer (rowsBetween(-3, 0)) — the smoothing window shape, decimal-
    exact then one double division."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        (
            F.sum(dec("o_totalprice")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("ma4"),
    )


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (o_orderstatus, o_orderpriority): the hierarchical
    subtotal ladder (detail → per-status → grand total), with grouping_id
    tagging each level — the drill-down twin of agg_cube's full lattice."""
    o = table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("cnt"),
        F.sum(dec("o_totalprice")).cast("double").alias("sum_price"),
    )


def agg_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via the Karp-Shenker-Papadimitriou single-pass sketch
    (df.freqItems): every value with frequency > support is GUARANTEED
    present (possible false positives, never false negatives) — the sketch
    family's answer to "top event types" without a full group-by.
    rows-only oracle (sketch contents depend on scan order); the pinning
    test asserts the containment guarantee against the exact counts."""
    e = table(spark, sf_dir, "events")
    out = e.freqItems(["event_type"], support=0.1)
    return out.select(
        F.array_sort(F.col("event_type_freqItems")).alias("freq_event_types")
    )


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) with grouping_id — the bitmask
    disambiguates subtotal NULL markers from real NULL data, which ROLLUP
    output alone cannot."""
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("cnt"),
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
    )


def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over a full-partition frame:
    each order row sees its customer's cheapest, priciest, and 2nd order."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice"), F.col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("cheapest_order"),
        F.last("o_orderkey").over(w).alias("priciest_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


def win_ntile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist over customer balances — the
    distribution-function window family (exact rationals in double, so
    cross-engine identical without rounding).

    DISTRIBUTED global rank, not ``Window.orderBy(...)`` with no partition
    key: the naive formulation funnels the whole table through ONE window
    task (the last inherently-serial window this engine had). Instead the
    classic two-pass rewrite: range-repartition on the order key, rank
    locally within each range partition, then add each partition's
    row-count prefix sum (a ``numPartitions``-row side table, broadcast
    back). The global rank is exact regardless of where the sampled range
    boundaries fall, and every distribution function is a closed form of
    (rank, N) because the order key (c_acctbal, c_custkey) is unique:
    percent_rank = (rank-1)/(N-1), cume_dist = rank/N, and ntile's
    first-(N mod k)-tiles-get-one-extra allocation in integer arithmetic —
    all bit-identical to the engines' builtins, which the unchanged DuckDB
    builtin-window oracle proves on every verify run.

    The two-pass rank itself lives in ``_util.dist_global_rank`` (shared
    since r13 with ``llm_lm_perplexity``'s corpus-scale tercile, which
    shipped with the exact SinglePartition window this id eliminated)."""
    from iot_data_pipeline_spark.operators._util import (
        dist_global_rank,
        ntile_closed_form,
    )

    k = 4
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    r = dist_global_rank(c, F.col("c_acctbal"), F.col("c_custkey"))
    return r.select(
        "c_custkey",
        ntile_closed_form(k).cast("int").alias("bal_quartile"),
        # percent_rank of a single-row partition is defined as 0.0 (what
        # the builtin and the DuckDB oracle return); the closed form
        # (rnk-1)/(n_total-1) would raise DIVIDE_BY_ZERO under ANSI mode.
        F.when(F.col("n_total") == 1, F.lit(0.0))
        .otherwise(
            (F.col("rnk") - 1).cast("double")
            / (F.col("n_total") - 1).cast("double")
        )
        .alias("bal_pct_rank"),
        (
            F.col("rnk").cast("double") / F.col("n_total").cast("double")
        ).alias("bal_cume_dist"),
    )


def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (FILTER / count_if): one scan producing
    per-flag metrics without pivoting."""
    li = table(spark, sf_dir, "lineitem")
    returned = F.col("l_returnflag") == "R"
    return li.groupBy("l_linestatus").agg(
        F.count_if(returned).alias("n_returned"),
        F.count_if(~returned).alias("n_kept"),
        F.sum(F.when(returned, dec("l_quantity"))).cast("double").alias(
            "qty_returned"
        ),
    )


def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String aggregation (listagg): region's nations as one sorted CSV.
    collect_list order is nondeterministic by contract — array_sort makes
    the result deterministic before joining."""
    n = table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
        F.count(F.lit(1)).alias("n_nations"),
    )


def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation / covariance of quantity vs extended price (rounded —
    the only non-decimal-exact aggregates, drift ≪ 1e-8)."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "covar_qty_price"
        ),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Additional sinks / round trips
# ---------------------------------------------------------------------------


def sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + schema-enforced read-back (lossless for these types)."""
    n = table(spark, sf_dir, "nation")
    out = tempfile.mkdtemp(prefix="sink_csv_") + "/nation"
    n.write.mode("overwrite").option("header", True).csv(out)
    return spark.read.csv(
        out,
        header=True,
        schema="n_nationkey INT, n_name STRING, n_regionkey INT",
        enforceSchema=True,
    )


def sink_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + schema-enforced read-back (doubles serialize with
    full precision, so the trip is exact)."""
    s = table(spark, sf_dir, "supplier")
    out = tempfile.mkdtemp(prefix="sink_json_") + "/supplier"
    s.write.mode("overwrite").json(out)
    return spark.read.json(
        out,
        schema="s_suppkey BIGINT, s_name STRING, s_nationkey INT,"
        " s_acctbal DOUBLE",
    )


def sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + read-back: the second columnar format Spark ships native
    (same vectorized reader, predicate pushdown, and column pruning paths
    as parquet). Types here (int/string/double) round-trip exactly."""
    c = table(spark, sf_dir, "customer")
    out = tempfile.mkdtemp(prefix="sink_orc_") + "/customer"
    c.write.mode("overwrite").orc(out)
    return spark.read.orc(out)


def sink_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink + read-back through Spark 4's NATIVE XML data source (no
    external package): write ``nation`` as an XML document per partition
    (rowTag/rootTag), read it back with the same rowTag. The reader infers
    integers as BIGINT, so the read side casts back to the source schema —
    the oracle (plain SELECT from nation) then proves the text round trip
    lossless. XML is the interchange format the schema-inference path is
    weakest on; pinning it with a hash oracle keeps regressions loud."""
    n = table(spark, sf_dir, "nation")
    out = tempfile.mkdtemp(prefix="sink_xml_") + "/nation"
    (
        n.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "nations")
        .option("rowTag", "nation")
        .save(out)
    )
    raw = (
        spark.read.format("xml").option("rowTag", "nation").load(out)
    )
    return raw.select(
        F.col("n_nationkey").cast("int").alias("n_nationkey"),
        F.col("n_name").cast("string").alias("n_name"),
        F.col("n_regionkey").cast("int").alias("n_regionkey"),
    )


def sink_parquet_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout-optimized write: ``repartitionByRange`` on the filter column +
    ``sortWithinPartitions`` before the parquet write, so each file owns a
    disjoint l_shipdate range and every row group's min/max stats are tight.
    A later time-range read then skips whole files/row-groups from footer
    stats alone — at 100 TB this layout (or its multi-column Z-order
    generalization) is the difference between scanning a week and scanning
    the lake. The range partitioner samples the data to pick bounds; that
    only moves file boundaries, never values, so results stay exact."""
    li = table(spark, sf_dir, "lineitem")
    out = tempfile.mkdtemp(prefix="sink_sorted_") + "/lineitem"
    (
        li.repartitionByRange(8, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out).filter(
        F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz")
    )
    return back.select(
        "l_orderkey", "l_linenumber", "l_shipdate", "l_quantity"
    )


def zorder_key(x, y):
    """Morton/Z-order key: interleave the low 16 bits of two non-negative
    int columns (x → even bit positions, y → odd) into one 32-bit value.
    Pure shift/mask Catalyst arithmetic — 64 codegen terms, no UDF — and
    bit-for-bit reproducible in ANSI SQL, so the oracle recomputes it."""
    xl = x.cast("long").bitwiseAND(F.lit(0xFFFF))
    yl = y.cast("long").bitwiseAND(F.lit(0xFFFF))
    acc = F.lit(0).cast("long")
    for i in range(16):
        acc = acc + F.shiftleft(F.shiftright(xl, i).bitwiseAND(F.lit(1)), 2 * i)
        acc = acc + F.shiftleft(
            F.shiftright(yl, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return acc


def _sql_zorder_key(x: str, y: str) -> str:
    """DuckDB twin of :func:`zorder_key` — the identical 32-term shift/mask
    sum, so engine and oracle agree on every bit."""
    terms = []
    for i in range(16):
        terms.append(f"((({x} & 65535) >> {i}) & 1) << {2 * i}")
        terms.append(f"((({y} & 65535) >> {i}) & 1) << {2 * i + 1}")
    return "(" + " + ".join(f"({t})" for t in terms) + ")"


def sink_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order-clustered write + 2-D box read — the MULTI-column data-
    skipping layout ``sink_parquet_sorted`` points at: interleaving the
    bits of (custkey, order-day) into one Morton key (:func:`zorder_key`)
    and range-partitioning + sorting on it gives every file a LOCALIZED
    bounding box in BOTH dimensions, so a predicate on either column (or
    a 2-D box) skips files from parquet footer min/max stats alone. A
    single-column sort prunes only its own column — the skipping contrast
    (z-ordered files prune on custkey, date-sorted files cannot) is
    asserted from real footer stats in tests/test_analytics.py
    (test_zorder_layout_prunes_on_the_second_dimension).

    At 100 TB the shape is identical — the Morton key is a narrow
    projection (no shuffle beyond the one range-exchange the write needs
    anyway), and the range partitioner's sampled bounds only move file
    boundaries, never values. 16-bit quantization per dimension (65536
    cells per axis) is the standard lakehouse default; widen the masks
    for higher-cardinality clustering columns. The read-back box filter
    returns byte-identical rows to the oracle's direct filter, with the
    z-key recomputed in SQL bit for bit."""
    o = table(spark, sf_dir, "orders")
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01").cast("date"))
    keyed = o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        "o_totalprice",
        zorder_key(F.col("o_custkey"), day).alias("zval"),
    )
    out = tempfile.mkdtemp(prefix="sink_zorder_") + "/orders"
    (
        keyed.repartitionByRange(16, "zval")
        .sortWithinPartitions("zval")
        .write.mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    return back.filter(
        F.col("o_custkey").between(20, 120)
        & F.col("o_orderdate").between(
            F.lit("1997-01-01").cast("timestamp_ntz"),
            F.lit("1997-12-31").cast("timestamp_ntz"),
        )
    )


def sink_compact_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction — the lake-maintenance job every streaming
    ingest eventually needs: a 64-file fragmented table is rewritten to 4
    files with ``coalesce`` (narrow — merges partitions in place, NO
    shuffle; ``repartition`` would pay a full exchange for the same file
    count). File counts are asserted in tests; values round-trip exactly
    (oracle = source table)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    root = tempfile.mkdtemp(prefix="sink_compact_")
    frag = root + "/fragmented"
    li.repartition(64).write.mode("overwrite").parquet(frag)
    compact = root + "/compact"
    spark.read.parquet(frag).coalesce(4).write.mode("overwrite").parquet(
        compact
    )
    return spark.read.parquet(compact)


def sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned parquet write + partition-pruned read: the filter on
    the partition column prunes directories at planning time (PartitionFilters,
    asserted in tests) — at 100 TB this is the difference between scanning
    one status and scanning the lake."""
    o = table(spark, sf_dir, "orders")
    out = tempfile.mkdtemp(prefix="sink_part_") + "/orders"
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    return back.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )


_CMS_W, _CMS_P = 256, (1 << 61) - 1
_CMS_KMOD = 1 << 31  # pre-reduction keeps key·A+B inside int64 (ADVICE r6)
_CMS_A = [2654435761, 40503, 2246822519, 3266489917]
_CMS_B = [99991, 911, 7919, 104729]


def agg_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) — the heavy-hitter
    frequency sketch missing from the family (HLL = distinct, KSP = freq
    items, GK = quantiles): d=4 pairwise-independent-style rows of w=256
    counters, point estimate = min over rows. The hashes are FIXED integer
    affine maps mod a Mersenne prime, so unlike the engine-internal
    sketches this one is bit-deterministic and the DuckDB oracle rebuilds
    the identical sketch — a hash-green sketch row, not rows-only.

    Scale shape: construction is one partial+final aggregate over
    (row, bucket) — the sketch is d·w rows regardless of input size (the
    point of a sketch), broadcast back to the probe keys for estimation.
    The posexplode is a 1→4 narrow expansion, no join on the build side.
    The probe set (user_id < 20) stands in for the downstream heavy-hitter
    candidates; the CMS guarantee est ≥ exact is pinned in tests."""
    e = table(spark, sf_dir, "events").select("user_id")

    def bkt(i: int):
        # ADVICE r6: reduce the key below 2^31 BEFORE the affine map —
        # (2^31-1)·max(_CMS_A)+max(_CMS_B) ≈ 7.0e18 < 2^63-1, so the
        # product can never wrap in Spark (non-ANSI silent) nor error in
        # DuckDB (BIGINT overflow); keys < 2^31 hash identically to the
        # unreduced form, larger keys fold mod 2^31 first (a documented
        # key-domain reduction, not a correctness loss for a sketch).
        return (
            ((F.col("user_id") % _CMS_KMOD) * _CMS_A[i] + _CMS_B[i]) % _CMS_P
        ) % _CMS_W

    buckets = F.array(*[bkt(i) for i in range(len(_CMS_A))])
    sketch = (
        e.select(F.posexplode(buckets).alias("row_i", "bucket"))
        .groupBy("row_i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    probes = (
        e.where(F.col("user_id") < 20)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    probe_h = probes.select(
        "user_id", "exact_cnt", F.posexplode(buckets).alias("row_i", "bucket")
    )
    return (
        probe_h.join(F.broadcast(sketch), ["row_i", "bucket"])
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
        .orderBy("user_id")
    )


QUERIES = {
    "meta_profile": meta_profile,
    "agg_countmin": agg_countmin,
    "join_cross": join_cross,
    "join_null_safe": join_null_safe,
    "fn_string_suite2": fn_string_suite2,
    "agg_cube": agg_cube,
    "agg_rollup": agg_rollup,
    "agg_freq_items": agg_freq_items,
    "agg_group_median": agg_group_median,
    "win_moving_avg": win_moving_avg,
    "gen_date_dim": gen_date_dim,
    "agg_bool": agg_bool,
    "win_pct_of_total": win_pct_of_total,
    "agg_arg_minmax": agg_arg_minmax,
    "win_lag_default": win_lag_default,
    "agg_null_semantics": agg_null_semantics,
    "agg_approx_quantiles": agg_approx_quantiles,
    "win_first_last": win_first_last,
    "win_ntile_dist": win_ntile_dist,
    "agg_conditional": agg_conditional,
    "agg_string_agg": agg_string_agg,
    "agg_corr": agg_corr,
    "agg_pivot": agg_pivot,
    "set_unpivot": set_unpivot,
    "win_range_frame": win_range_frame,
    "meta_describe": meta_describe,
    "sink_csv_roundtrip": sink_csv_roundtrip,
    "sink_json_roundtrip": sink_json_roundtrip,
    "sink_orc_roundtrip": sink_orc_roundtrip,
    "sink_xml_roundtrip": sink_xml_roundtrip,
    "sink_parquet_sorted": sink_parquet_sorted,
    "sink_zorder_layout": sink_zorder_layout,
    "sink_compact_files": sink_compact_files,
    "sink_parquet_partitioned": sink_parquet_partitioned,
}

# Generated from the engine's constants so a parameter tweak can never
# desynchronize the oracle's sketch from the engine's.
_CMS_HASH_SQL = (
    f"(((user_id % {_CMS_KMOD}) * CASE quad.i "
    + " ".join(f"WHEN {i} THEN {a}" for i, a in enumerate(_CMS_A[:-1]))
    + f" ELSE {_CMS_A[-1]} END + CASE quad.i "
    + " ".join(f"WHEN {i} THEN {b}" for i, b in enumerate(_CMS_B[:-1]))
    + f" ELSE {_CMS_B[-1]} END) % {_CMS_P}) % {_CMS_W}"
)

ORACLES = {
    # The oracle REBUILDS the identical sketch (same affine hashes mod the
    # same Mersenne prime) and takes the same min-over-rows estimate.
    "agg_countmin": (
        "WITH h AS (SELECT quad.i AS row_i, " + _CMS_HASH_SQL + " AS bucket"
        "           FROM events"
        "           CROSS JOIN (VALUES (0), (1), (2), (3)) AS quad(i)),"
        " sk AS (SELECT row_i, bucket, COUNT(*) AS cnt FROM h"
        "        GROUP BY row_i, bucket),"
        " pr AS (SELECT user_id, COUNT(*) AS exact_cnt FROM events"
        "        WHERE user_id < 20 GROUP BY user_id),"
        " ph AS (SELECT pr.user_id, pr.exact_cnt, quad.i AS row_i, "
        + _CMS_HASH_SQL + " AS bucket"
        "        FROM pr CROSS JOIN (VALUES (0), (1), (2), (3)) AS quad(i))"
        " SELECT ph.user_id, ph.exact_cnt, MIN(sk.cnt) AS cms_est"
        " FROM ph JOIN sk ON ph.row_i = sk.row_i AND ph.bucket = sk.bucket"
        " GROUP BY ph.user_id, ph.exact_cnt ORDER BY ph.user_id"
    ),
    "meta_profile": (
        "WITH base AS (SELECT COUNT(*) AS n_rows FROM customer)"
        " SELECT u.col_name, u.n_nonnull, u.n_distinct, u.min_num, u.max_num,"
        " u.min_str, u.max_str, base.n_rows FROM base, ("
        " SELECT 'c_custkey' AS col_name, COUNT(c_custkey) AS n_nonnull,"
        "  COUNT(DISTINCT c_custkey) AS n_distinct,"
        "  CAST(MIN(c_custkey) AS DOUBLE) AS min_num,"
        "  CAST(MAX(c_custkey) AS DOUBLE) AS max_num,"
        "  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str"
        "  FROM customer"
        " UNION ALL SELECT 'c_nationkey', COUNT(c_nationkey),"
        "  COUNT(DISTINCT c_nationkey), CAST(MIN(c_nationkey) AS DOUBLE),"
        "  CAST(MAX(c_nationkey) AS DOUBLE), NULL, NULL FROM customer"
        " UNION ALL SELECT 'c_acctbal', COUNT(c_acctbal),"
        "  COUNT(DISTINCT c_acctbal), MIN(c_acctbal), MAX(c_acctbal),"
        "  NULL, NULL FROM customer"
        " UNION ALL SELECT 'c_name', COUNT(c_name), COUNT(DISTINCT c_name),"
        "  NULL, NULL, MIN(c_name), MAX(c_name) FROM customer"
        " UNION ALL SELECT 'c_mktsegment', COUNT(c_mktsegment),"
        "  COUNT(DISTINCT c_mktsegment), NULL, NULL, MIN(c_mktsegment),"
        "  MAX(c_mktsegment) FROM customer) u"
    ),
    "join_cross": (
        "SELECT r_regionkey, r_name, n_nationkey, n_name"
        " FROM region CROSS JOIN nation"
    ),
    "join_null_safe": (
        "WITH dim AS (SELECT n_nationkey AS nk, n_name FROM nation"
        "             UNION ALL SELECT NULL, 'UNKNOWN')"
        " SELECT c_custkey, c_nationkey, dim.n_name"
        " FROM customer JOIN dim"
        " ON NULLIF(c_nationkey, 3) IS NOT DISTINCT FROM dim.nk"
    ),
    "win_lag_default": (
        "SELECT o_orderkey, o_custkey,"
        " LAG(o_totalprice, 2, 0.0) OVER w AS prev2_price,"
        " LEAD(o_totalprice, 1, -1.0) OVER w AS next_price"
        " FROM orders WINDOW w AS (PARTITION BY o_custkey"
        " ORDER BY o_orderdate, o_orderkey)"
    ),
    "agg_null_semantics": (
        "SELECT c_mktsegment, COUNT(*) AS n_rows,"
        " COUNT(o_orderkey) AS n_big_orders,"
        " CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_big,"
        " CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)"
        "   / COUNT(o_totalprice) AS avg_big"
        " FROM customer LEFT JOIN (SELECT * FROM orders"
        "   WHERE o_totalprice > 450000.0) o ON c_custkey = o_custkey"
        " GROUP BY c_mktsegment"
    ),
    "win_pct_of_total": (
        "SELECT o_orderkey, o_custkey,"
        " ROUND(o_totalprice / CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))"
        "   OVER (PARTITION BY o_custkey) AS DOUBLE), 6) AS pct_of_cust"
        " FROM orders"
    ),
    "agg_arg_minmax": (
        "SELECT o_custkey,"
        " arg_max(o_orderdate, o_orderkey) AS latest_key_date,"
        " arg_min(o_orderdate, o_orderkey) AS earliest_key_date,"
        " arg_max(o_totalprice, o_orderkey) AS latest_key_price"
        " FROM orders GROUP BY o_custkey"
    ),
    "agg_bool": (
        "SELECT l_linestatus,"
        " bool_and(l_quantity > 0) AS all_positive_qty,"
        " bool_or(l_discount > 0.05) AS any_big_discount,"
        " bool_and(l_tax < 0.09) AS all_low_tax"
        " FROM lineitem GROUP BY l_linestatus"
    ),
    "gen_date_dim": (
        "SELECT CAST(u.r AS DATE) AS d, YEAR(u.r) AS y, MONTH(u.r) AS m,"
        " DAY(u.r) AS dom, strftime(u.r, '%Y-%m') AS ym,"
        " dayofweek(u.r) IN (0, 6) AS is_weekend"
        " FROM (SELECT unnest(generate_series(DATE '2024-01-01',"
        "       DATE '2024-03-31', INTERVAL 1 DAY)) AS r) u"
    ),
    "agg_group_median": (
        "SELECT o_orderpriority,"
        " ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,"
        " ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,"
        " COUNT(*) AS n FROM orders GROUP BY o_orderpriority"
    ),
    "win_moving_avg": (
        "SELECT o_orderkey, o_custkey,"
        " CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE)"
        "   / COUNT(*) OVER w AS ma4"
        " FROM orders WINDOW w AS (PARTITION BY o_custkey"
        " ORDER BY o_orderdate, o_orderkey"
        " ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)"
    ),
    "agg_rollup": (
        "SELECT o_orderstatus, o_orderpriority,"
        " GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,"
        " COUNT(*) AS cnt,"
        " CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)"
        "   AS sum_price"
        " FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)"
    ),
    "agg_cube": (
        "SELECT l_returnflag, l_linestatus,"
        " GROUPING(l_returnflag, l_linestatus) AS gid,"
        " COUNT(*) AS cnt,"
        " CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty"
        " FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)"
    ),
    "fn_string_suite2": (
        "SELECT p_partkey,"
        " lpad(p_brand, 12, '*') AS brand_lpad,"
        " rpad(p_brand, 12, '.') AS brand_rpad,"
        " repeat('ab', 3) AS rep,"
        " reverse(p_brand) AS brand_rev,"
        " translate(p_type, 'AEIOU', 'aeiou') AS type_tr,"
        " substring(p_name, 1, 3) AS name_left,"
        " strpos(p_type, 'ED') AS ed_pos"
        " FROM part"
    ),
    # agg_approx_quantiles: rows-only (sketch is engine-specific).
    "win_first_last": (
        "SELECT o_orderkey, o_custkey,"
        " FIRST_VALUE(o_orderkey) OVER w AS cheapest_order,"
        " LAST_VALUE(o_orderkey) OVER w AS priciest_order,"
        " NTH_VALUE(o_orderkey, 2) OVER w AS second_order"
        " FROM orders WINDOW w AS (PARTITION BY o_custkey"
        " ORDER BY o_totalprice, o_orderkey"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
    ),
    "win_ntile_dist": (
        "SELECT c_custkey, NTILE(4) OVER w AS bal_quartile,"
        " PERCENT_RANK() OVER w AS bal_pct_rank,"
        " CUME_DIST() OVER w AS bal_cume_dist"
        " FROM customer WINDOW w AS (ORDER BY c_acctbal, c_custkey)"
    ),
    "agg_conditional": (
        "SELECT l_linestatus,"
        " COUNT(*) FILTER (l_returnflag = 'R') AS n_returned,"
        " COUNT(*) FILTER (l_returnflag != 'R') AS n_kept,"
        " CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))"
        "      FILTER (l_returnflag = 'R') AS DOUBLE) AS qty_returned"
        " FROM lineitem GROUP BY l_linestatus"
    ),
    "agg_string_agg": (
        "SELECT n_regionkey,"
        " string_agg(n_name, ',' ORDER BY n_name) AS nations,"
        " COUNT(*) AS n_nations"
        " FROM nation GROUP BY n_regionkey"
    ),
    "agg_corr": (
        "SELECT ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,"
        " ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,"
        " COUNT(*) AS n FROM lineitem"
    ),
    "agg_pivot": (
        "SELECT o_orderpriority,"
        " COUNT(*) FILTER (o_orderstatus = 'F') AS n_f,"
        " COUNT(*) FILTER (o_orderstatus = 'O') AS n_o,"
        " COUNT(*) FILTER (o_orderstatus = 'P') AS n_p"
        " FROM orders GROUP BY o_orderpriority"
    ),
    "set_unpivot": (
        "SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,"
        " l_quantity AS value FROM lineitem"
        " UNION ALL"
        " SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS metric,"
        " l_extendedprice AS value FROM lineitem"
    ),
    "win_range_frame": (
        "SELECT o_orderkey, o_custkey, o_orderdate,"
        " CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER ("
        "   PARTITION BY o_custkey ORDER BY epoch(o_orderdate)"
        "   RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE)"
        "   AS spend_30d"
        " FROM orders"
    ),
    "meta_describe": (
        "SELECT * FROM (VALUES"
        " (0, 'l_orderkey', 'bigint'), (1, 'l_partkey', 'bigint'),"
        " (2, 'l_suppkey', 'bigint'), (3, 'l_linenumber', 'int'),"
        " (4, 'l_quantity', 'double'), (5, 'l_extendedprice', 'double'),"
        " (6, 'l_discount', 'double'), (7, 'l_tax', 'double'),"
        " (8, 'l_returnflag', 'string'), (9, 'l_linestatus', 'string'),"
        " (10, 'l_shipdate', 'timestamp_ntz')"
        ") t(ordinal, col_name, data_type)"
    ),
    "sink_csv_roundtrip": "SELECT * FROM nation",
    "sink_json_roundtrip": "SELECT * FROM supplier",
    "sink_orc_roundtrip": "SELECT * FROM customer",
    "sink_xml_roundtrip": "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "sink_compact_files": (
        "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice"
        " FROM lineitem"
    ),
    "sink_parquet_sorted": (
        "SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity"
        " FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'"
    ),
    "sink_parquet_partitioned": (
        "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,"
        " o_orderdate FROM orders WHERE o_orderstatus = 'F'"
    ),
    # The z-key is recomputed in SQL with the identical 32-term shift/mask
    # sum, so a formula tweak can never desynchronize engine and oracle.
    "sink_zorder_layout": (
        "SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice, "
        + _sql_zorder_key(
            "o_custkey", "DATEDIFF('day', DATE '1992-01-01', o_orderdate)"
        )
        + " AS zval FROM orders"
        " WHERE o_custkey BETWEEN 20 AND 120"
        " AND o_orderdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'"
        " AND TIMESTAMP '1997-12-31 00:00:00'"
    ),
}
