"""Event-analytics operators over the ``events`` table: batch
sessionization, funnel conversion, weekly retention — the ad-hoc serving
queries the reference delegates to ClickHouse (`README.md:209-215`,
label-analytics implied by `README.md:64-80`), expressed as single-pass
window/aggregate plans.

Scale notes: every operator here is one shuffle on user_id (sessionize,
funnel) or one shuffle on (week, user) pairs (retention). No self-joins on
raw events; sequences are resolved with windows, so state per key is O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iot_data_pipeline_spark.operators._util import (
    dec,
    dsum,
    dsum_prod,
    sql_dsum,
    sql_dsum_prod,
    table,
)


def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gap-and-islands): per-user sessions with a
    30-minute inactivity gap — the batch twin of stream_session_win, same
    session boundaries, computed with lag + running sum in one window pass."""
    e = table(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_accum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap_us = 30 * 60 * 1_000_000
    prev_ts = F.lag(F.unix_micros(F.col("ts"))).over(w_order)
    is_new = F.when(
        prev_ts.isNull()
        | (F.unix_micros(F.col("ts")) - prev_ts >= gap_us),
        1,
    ).otherwise(0)
    sessions = e.withColumn("sid", F.sum(is_new).over(w_accum))
    return sessions.groupBy("user_id", "sid").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias(
            "session_value"
        ),
    )


def evt_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion: per user, first signup → first subsequent
    purchase, the purchase strictly after the signup.

    ONE shuffle on user_id: the per-user signup time comes from an
    unordered window (hash-partitions on user_id, no sort), and the
    following groupBy(user_id, signup_ts) reuses that partitioning —
    HashPartitioning(user_id) satisfies the clustered distribution of any
    key set containing user_id, so Catalyst inserts no second Exchange
    (asserted in tests/test_plans.py). The previous formulation aggregated,
    joined back, and re-aggregated — two full shuffles of the events table."""
    e = table(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id")
    signup_ts = F.min(
        F.when(F.col("event_type") == "signup", F.col("ts"))
    ).over(w_user)
    e2 = e.withColumn("signup_ts", signup_ts)
    first_purchase = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("signup_ts")),
            F.col("ts"),
        )
    )
    return (
        e2.groupBy("user_id", "signup_ts")
        .agg(first_purchase.alias("purchase_ts"))
        .select(
            "user_id",
            "signup_ts",
            "purchase_ts",
            F.col("signup_ts").isNotNull().alias("reached_signup"),
            F.col("purchase_ts").isNotNull().alias("converted"),
        )
    )


def evt_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week retention: of the users active in ISO week W, how many
    were active again in W+1. Distinct (week, user) pairs → one self-join on
    the small distinct set, never on raw events."""
    e = table(spark, sf_dir, "events")
    wk = e.select(
        F.date_trunc("week", F.col("ts")).alias("week"), "user_id"
    ).distinct()
    nxt = wk.select(
        (F.col("week") - F.expr("INTERVAL 7 DAYS")).alias("week"),
        F.col("user_id").alias("user_next"),
    )
    joined = wk.join(
        nxt,
        (wk.week == nxt.week) & (wk.user_id == nxt.user_next),
        "left",
    )
    return (
        joined.groupBy(wk.week.alias("week"))
        .agg(
            F.count(F.lit(1)).alias("active_users"),
            F.count("user_next").alias("retained_next_week"),
        )
        # Spark date_trunc returns timestamp; DuckDB's returns DATE.
        .withColumn("week", F.col("week").cast("date"))
    )


def evt_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users + event volume — the first dashboard query every
    event store serves."""
    e = table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    return e.groupBy(day.alias("day")).agg(
        F.countDistinct("user_id").alias("dau"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias(
            "total_value"
        ),
    )


def iot_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensor downsampling / rollup (hypertable continuous-aggregate shape):
    per-device 1-hour buckets with decimal-exact avg/min/max — the
    resolution-reduction step every long-retention IoT store performs."""
    e = table(spark, sf_dir, "events")
    bucket = F.date_trunc("hour", F.col("ts"))
    return (
        e.groupBy(bucket.alias("hour"), F.col("user_id").alias("device_id"))
        .agg(
            F.count(F.lit(1)).alias("n_readings"),
            (
                F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
                / F.count("value")
            ).alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


def iot_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-device anomaly flags: |reading − device mean| > 2.5 device
    stddevs. Moments come from exact decimal sums (Σx, Σx²) so the z-score
    threshold decision is bit-identical across engines — a threshold
    comparison is the one place a last-ulp difference flips a row."""
    e = table(spark, sf_dir, "events")
    sum_x = F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
    sum_x2 = F.sum(
        (F.col("value").cast("decimal(18,4)") * F.col("value").cast("decimal(18,4)"))
    ).cast("double")
    n = F.count("value").cast("double")
    stats = e.groupBy("user_id").agg(
        sum_x.alias("sx"), sum_x2.alias("sx2"), n.alias("n")
    )
    mean = F.col("sx") / F.col("n")
    var = (F.col("sx2") - F.col("sx") * F.col("sx") / F.col("n")) / (
        F.col("n") - F.lit(1.0)
    )
    joined = e.join(F.broadcast(stats), "user_id")
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        joined.withColumn("z", F.round(z, 4))
        .filter(F.abs(z) > 2.5)
        .select("event_id", "user_id", "ts", "value", "z")
    )


def agg_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch use of F.window() — the SAME tumbling-window function the
    streaming queries use, proving the batch/stream unification: 15-minute
    buckets over events with per-bucket stats. The window struct is
    flattened to start/end columns for the oracle."""
    e = table(spark, sf_dir, "events")
    w = F.window("ts", "15 minutes")
    return (
        e.groupBy(w.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "n_events",
            "total_value",
        )
    )


def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (10 buckets over [0, 100)): pure
    arithmetic bucketing — floor(value/10) clamped — one aggregation, the
    profile-pane query every engine serves. Deterministic: bucket edges are
    exact integers, no percentile estimation."""
    e = table(spark, sf_dir, "events")
    bucket = F.least(
        F.greatest(F.floor(F.col("value") / 10).cast("int"), F.lit(0)),
        F.lit(9),
    )
    return (
        e.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
    )


def evt_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style latest-state snapshot: the most recent event per user (the
    "current device state" query a serving store answers). Formulated as ONE
    aggregation with ``max_by`` over a composite ordering key — unlike the
    row_number-window top-1, this gets map-side partial aggregation, so the
    shuffle carries one row per (partition, user), not every event. The key
    is zero-padded ``(epoch_micros, event_id)`` text, totally ordered and
    engine-independent (event_id breaks exact-timestamp ties)."""
    e = table(spark, sf_dir, "events")
    ok = F.concat(
        F.lpad(F.unix_micros(F.col("ts")).cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    k = e.withColumn("ok", ok)
    return k.groupBy("user_id").agg(
        F.max_by("ts", "ok").alias("ts"),
        F.max_by("event_id", "ok").alias("event_id"),
        F.max_by("event_type", "ok").alias("event_type"),
        F.max_by("value", "ok").alias("value"),
    )


def evt_active_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap count per day ("how many urgent-order promo windows
    are open on each calendar day") — the range-join-shaped question
    answered WITHOUT a range join. Sweep-line formulation: each 3-day
    window contributes +1 at its start day and -1 past its end; the
    distributed part is two partial+final aggregations over orders (one
    shuffle each, carrying one row per day), and the prefix-sum runs on
    the |days| rows only (~2.4k here) — a bounded single-partition window
    that stays bounded at ANY corpus scale because the calendar doesn't
    grow with the data. The naive day×interval join this replaces is
    O(days × windows) and is kept solely as the DuckDB oracle."""
    o = table(spark, sf_dir, "orders")
    u = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.to_date("o_orderdate").alias("d")
    )
    starts = u.groupBy("d").agg(F.count(F.lit(1)).alias("delta"))
    ends = (
        u.select(F.date_add("d", 3).alias("d"))
        .groupBy("d")
        .agg((-F.count(F.lit(1))).alias("delta"))
    )
    deltas = (
        starts.unionByName(ends).groupBy("d").agg(F.sum("delta").alias("delta"))
    )
    bounds = u.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    joined = spine.join(deltas, spine.day == deltas.d, "left").select(
        "day", F.coalesce("delta", F.lit(0)).alias("delta")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        "day", F.sum("delta").over(w).alias("open_windows")
    )


def evt_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day — the windowed COUNT(DISTINCT)
    Spark (and ANSI SQL) won't run directly, and the collect_set-over-
    window workaround holds every key in one window buffer. Scalable
    rewrite: distinct-so-far == count of users whose FIRST day is <= day,
    so aggregate min(day) per user (one shuffle, map-side partials), roll
    up to new-users-per-day, and prefix-sum over the bounded day spine.
    State per step is O(1); the serial tail scales with the calendar."""
    e = table(spark, sf_dir, "events")
    day = F.to_date("ts")
    first_seen = e.groupBy("user_id").agg(F.min(day).alias("d"))
    new_users = first_seen.groupBy("d").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    days = e.select(day.alias("day")).distinct()
    joined = days.join(new_users, days.day == new_users.d, "left").select(
        "day", F.coalesce("new_users", F.lit(0)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cum_users"),
    )


def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE (most frequent event_type per user). Native
    ``mode()`` in both Spark and DuckDB picks an ARBITRARY value on ties —
    a silent cross-run divergence — so this pins the tie-break to the
    lexicographically smallest value via ``min_by`` over a composite
    ``(inverted count, value)`` key. Two partial-agg shuffles
    ((user, type) then user), both carrying one row per group."""
    e = table(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    key = F.concat(
        F.lpad((F.lit(100000000) - F.col("cnt")).cast("string"), 12, "0"),
        F.col("event_type"),
    )
    return c.groupBy("user_id").agg(
        F.min_by("event_type", key).alias("mode_type"),
        F.max("cnt").alias("mode_cnt"),
    )


def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user linear trend (OLS slope/intercept of value vs day index)
    from sufficient statistics: one partial+final aggregation computes
    (n, Σx, Σy, Σxy, Σx²) and the closed form runs on the aggregated row —
    the way regression scales (no second pass, no per-user collect). Exact
    decimal sums make the moments bit-identical across engines; the
    product sums go through the floor-to-1e-4 recipe (``dsum_prod``)
    because high-scale decimal→double casts round differently per engine.
    Built-in regr_slope/regr_intercept exist but sum doubles directly —
    order-dependent, so unusable for a reproducibility-pinned pipeline."""
    e = table(spark, sf_dir, "events")
    x = F.datediff(
        F.to_date("ts"), F.lit("2024-01-01").cast("date")
    ).cast("bigint")
    d = e.select("user_id", x.alias("x"), F.col("value").alias("y"))
    s = d.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum("x", "sx"),
        dsum("y", "sy"),
        dsum_prod(dec("x") * dec("y"), "sxy"),
        dsum_prod(dec("x") * dec("x"), "sxx"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx = F.col("sxy"), F.col("sxx")
    slope = (n * sxy - sx * sy) / F.nullif(n * sxx - sx * sx, F.lit(0.0))
    return s.select(
        "user_id",
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
    )


def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmap aggregation (Spark 3.5 bitmap
    fns): keys bucket into 32k-bit bitmaps, ``bitmap_construct_agg`` ORs
    bits per (group, bucket) with map-side partials, and the popcount sum
    is the exact distinct. Unlike count(DISTINCT) — which shuffles every
    distinct (group, key) pair — the shuffle here carries one 4 KB bitmap
    per (group, bucket), a fixed bound however many keys repeat; for dense
    integer keyspaces this is the exact-answer alternative to HLL."""
    e = table(spark, sf_dir, "events")
    return (
        e.select("event_type", F.col("user_id").alias("k"))
        .groupBy("event_type", F.bitmap_bucket_number("k").alias("bucket"))
        .agg(F.bitmap_construct_agg(F.bitmap_bit_position("k")).alias("bm"))
        .groupBy("event_type")
        .agg(F.sum(F.bitmap_count("bm")).alias("n_distinct_users"))
    )


def _hourly_readings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(device, hour) average readings — the shared input of the
    gap-fill / interpolate pair."""
    e = table(spark, sf_dir, "events")
    return e.groupBy(
        F.col("user_id").alias("device_id"),
        F.date_trunc("hour", F.col("ts")).alias("hour"),
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1))
        ).alias("v")
    )


def _pair_obs(r: DataFrame, bounds: DataFrame) -> DataFrame:
    """Pair-expansion spine shared by gap-fill and interpolate: the
    NON-NULL readings of each device, each paired with its successor via
    one lead() window, carrying the broadcast global [lo, hi] span.

    NULL-valued readings (an hour bucket whose every event value is NULL)
    are NOT observations: the previous dense-grid formulation's
    ``last(..., ignorenulls)`` carries skipped them, so they must not
    anchor a block here either — their cells fall inside a neighboring
    block and are treated as gaps, exactly as before (round-9 review
    finding 1)."""
    w = Window.partitionBy("device_id").orderBy("hour")
    return (
        r.where(F.col("v").isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(
            "device_id",
            "hour",
            "v",
            "lo",
            "hi",
            F.lead("hour").over(w).alias("nt"),
            F.lead("v").over(w).alias("nv"),
            F.row_number().over(w).alias("rn"),
        )
    )


def _all_null_device_cells(r: DataFrame, bounds: DataFrame) -> DataFrame:
    """Full-span cells for devices with NO non-NULL reading: the previous
    grid formulation emitted their whole [lo, hi] span with nothing to
    carry; the pair expansion would otherwise drop them (round-9 review
    finding 1). Empty on any corpus where values are never all-NULL per
    device; device-level rows only, so the explode is bounded by
    devices x span like any other block."""
    return (
        r.groupBy("device_id")
        .agg(F.max(F.col("v").isNotNull()).alias("any_obs"))
        .where(~F.col("any_obs"))
        .crossJoin(F.broadcast(bounds))
        .select(
            "device_id",
            F.explode(
                F.expr("sequence(lo, hi, interval 1 hour)")
            ).alias("hour"),
        )
    )


def iot_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling with LOCF (the hypertable ``locf()`` shape):
    every hour in the global span gets the device's last reading carried
    forward; leading gaps stay NULL (nothing to carry).

    PAIR EXPANSION, not a dense-grid carry (reworked round 9): one lead()
    window over the OBSERVED readings bounds each reading's carry block,
    and the filled cells are generated narrowly after the window — the
    dense device x global-hour-span grid, its left join, and the grid-wide
    IGNORE-NULLS carry sort never exist. Shuffled rows are the
    observations only; every filled cell inherits its block's reading
    directly (LOCF). At 125x facts the old grid's carry sort spilled
    ~25 GB at the default memory profile; this plan spills zero
    (NOTES_r09)."""
    r = _hourly_readings(spark, sf_dir)
    bounds = r.agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
    obs = _pair_obs(r, bounds)
    # Leading gaps: cells before the first reading carry nothing (NULL).
    lead_cells = obs.where(
        (F.col("rn") == 1) & (F.col("hour") > F.col("lo"))
    ).select(
        "device_id",
        F.explode(
            F.expr("sequence(lo, hour - interval 1 hour, interval 1 hour)")
        ).alias("hour"),
        F.lit(None).cast("double").alias("v_filled"),
        F.lit(True).alias("is_gap"),
    )
    null_dev_cells = _all_null_device_cells(r, bounds).select(
        "device_id",
        "hour",
        F.lit(None).cast("double").alias("v_filled"),
        F.lit(True).alias("is_gap"),
    )
    block = obs.select(
        "device_id",
        F.col("hour").alias("pt"),
        F.col("v").alias("pv"),
        F.explode(
            F.expr(
                "sequence(hour, coalesce(nt - interval 1 hour, hi),"
                " interval 1 hour)"
            )
        ).alias("hour"),
    )
    return (
        block.select(
            "device_id",
            "hour",
            F.col("pv").alias("v_filled"),
            (F.col("hour") != F.col("pt")).alias("is_gap"),
        )
        .unionByName(lead_cells)
        .unionByName(null_dev_cells)
    )


def iot_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation across sensor gaps — the ``interpolate()`` twin
    of ``iot_gap_fill``: each missing cell takes the time-weighted blend
    of the nearest reading before and after it (edges stay NULL).

    PAIR EXPANSION, not a dense-grid carry (reworked round 9): one lead()
    window over the OBSERVED readings pairs each reading with its
    successor, then the missing cells between the pair are generated
    narrowly (explode AFTER the window, no shuffle). The previous
    formulation left-joined a devices x global-hour-span grid and ran two
    IGNORE-NULLS carry windows over it — at a 125x fact that grid's two
    sorts spilled ~40 GB at the default memory profile purely to
    re-derive, at every empty cell, the pair this window reads off
    directly (NOTES_r09). Output is identical (same blend arithmetic on
    the same long-epoch operands; NULL-valued readings excluded from the
    observation spine exactly as ignorenulls skipped them)."""
    r = _hourly_readings(spark, sf_dir)
    bounds = r.agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
    obs = _pair_obs(r, bounds)
    # Cells before a device's first reading exist in the global span with
    # NULL v_interp (no left neighbor) — emitted once from the rn==1 row.
    lead_cells = obs.where(
        (F.col("rn") == 1) & (F.col("hour") > F.col("lo"))
    ).select(
        "device_id",
        F.explode(
            F.expr("sequence(lo, hour - interval 1 hour, interval 1 hour)")
        ).alias("hour"),
        F.lit(None).cast("double").alias("v_interp"),
    )
    # [reading, next reading) — or [last reading, global hi] for the tail,
    # whose cells past the reading have no right neighbor (NULL).
    block = obs.select(
        "device_id",
        F.col("hour").alias("pt"),
        F.col("v").alias("pv"),
        "nt",
        "nv",
        F.explode(
            F.expr(
                "sequence(hour, coalesce(nt - interval 1 hour, hi),"
                " interval 1 hour)"
            )
        ).alias("hour"),
    )
    ratio = (
        F.col("hour").cast("long") - F.col("pt").cast("long")
    ) / (F.col("nt").cast("long") - F.col("pt").cast("long"))
    v_interp = (
        F.when(F.col("hour") == F.col("pt"), F.col("pv"))
        .when(
            F.col("nv").isNotNull(),
            F.col("pv") + (F.col("nv") - F.col("pv")) * ratio,
        )
    )
    null_dev_cells = _all_null_device_cells(r, bounds).select(
        "device_id",
        "hour",
        F.lit(None).cast("double").alias("v_interp"),
    )
    return (
        block.select("device_id", "hour", v_interp.alias("v_interp"))
        .unionByName(lead_cells)
        .unionByName(null_dev_cells)
    )


QUERIES = {
    "win_sessionize": win_sessionize,
    "evt_funnel": evt_funnel,
    "evt_retention": evt_retention,
    "iot_downsample": iot_downsample,
    "iot_anomaly": iot_anomaly,
    "evt_dau": evt_dau,
    "agg_time_window": agg_time_window,
    "agg_histogram": agg_histogram,
    "evt_latest_snapshot": evt_latest_snapshot,
    "evt_active_windows": evt_active_windows,
    "evt_cumulative_users": evt_cumulative_users,
    "agg_mode": agg_mode,
    "agg_regression": agg_regression,
    "agg_bitmap_distinct": agg_bitmap_distinct,
    "iot_gap_fill": iot_gap_fill,
    "iot_interpolate": iot_interpolate,
}

ORACLES = {
    "iot_interpolate": (
        "WITH r AS (SELECT user_id AS device_id,"
        "   date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,"
        "   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS v"
        "   FROM events GROUP BY 1, 2),"
        " b AS (SELECT min(hour) AS lo, max(hour) AS hi FROM r),"
        " hours AS (SELECT unnest(generate_series(lo, hi,"
        "   INTERVAL '1 hour')) AS hour FROM b),"
        " grid AS (SELECT d.device_id, h.hour FROM"
        "   (SELECT DISTINCT device_id FROM r) d CROSS JOIN hours h),"
        " j AS (SELECT g.device_id, g.hour, r.v FROM grid g"
        "   LEFT JOIN r ON r.device_id = g.device_id AND r.hour = g.hour),"
        " w AS (SELECT device_id, hour, v,"
        "   last_value(v IGNORE NULLS) OVER (PARTITION BY device_id"
        "     ORDER BY hour ROWS UNBOUNDED PRECEDING) AS pv,"
        "   last_value(CASE WHEN v IS NOT NULL THEN hour END IGNORE NULLS)"
        "     OVER (PARTITION BY device_id ORDER BY hour"
        "     ROWS UNBOUNDED PRECEDING) AS pt,"
        "   first_value(v IGNORE NULLS) OVER (PARTITION BY device_id"
        "     ORDER BY hour ROWS BETWEEN CURRENT ROW AND UNBOUNDED"
        "     FOLLOWING) AS nv,"
        "   first_value(CASE WHEN v IS NOT NULL THEN hour END IGNORE NULLS)"
        "     OVER (PARTITION BY device_id ORDER BY hour ROWS BETWEEN"
        "     CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt FROM j)"
        " SELECT device_id, hour,"
        " CASE WHEN v IS NOT NULL THEN v"
        "      WHEN pv IS NOT NULL AND nv IS NOT NULL THEN"
        # parenthesized to match the engine's association: ratio first,
        # then one multiply — a*b/c would round differently by 1 ulp.
        "        pv + (nv - pv) * ((epoch(hour) - epoch(pt))"
        "             / (epoch(nt) - epoch(pt)))"
        "      ELSE NULL END AS v_interp FROM w"
    ),
    "iot_gap_fill": (
        "WITH r AS (SELECT user_id AS device_id,"
        "   date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,"
        "   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS v"
        "   FROM events GROUP BY 1, 2),"
        " b AS (SELECT min(hour) AS lo, max(hour) AS hi FROM r),"
        " hours AS (SELECT unnest(generate_series(lo, hi,"
        "   INTERVAL '1 hour')) AS hour FROM b),"
        " devices AS (SELECT DISTINCT device_id FROM r),"
        " grid AS (SELECT d.device_id, h.hour FROM devices d"
        "   CROSS JOIN hours h),"
        " j AS (SELECT g.device_id, g.hour, r.v FROM grid g"
        "   LEFT JOIN r ON r.device_id = g.device_id AND r.hour = g.hour)"
        " SELECT device_id, hour,"
        " last_value(v IGNORE NULLS) OVER (PARTITION BY device_id"
        "   ORDER BY hour ROWS UNBOUNDED PRECEDING) AS v_filled,"
        " v IS NULL AS is_gap FROM j"
    ),
    "agg_bitmap_distinct": (
        "SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_users"
        " FROM events GROUP BY event_type"
    ),
    "agg_regression": (
        "WITH d AS (SELECT user_id,"
        "   CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS TIMESTAMP))"
        "        AS BIGINT) AS x, value AS y FROM events),"
        " s AS (SELECT user_id, CAST(COUNT(*) AS DOUBLE) AS n,"
        "   " + sql_dsum("x", "sx") + ","
        "   " + sql_dsum("y", "sy") + ","
        "   " + sql_dsum_prod(
            "CAST(x AS DECIMAL(18,4)) * CAST(y AS DECIMAL(18,4))", "sxy"
        ) + ","
        "   " + sql_dsum_prod(
            "CAST(x AS DECIMAL(18,4)) * CAST(x AS DECIMAL(18,4))", "sxx"
        ) + ""
        "   FROM d GROUP BY user_id)"
        " SELECT user_id,"
        " (n*sxy - sx*sy) / NULLIF(n*sxx - sx*sx, 0) AS slope,"
        " (sy - ((n*sxy - sx*sy) / NULLIF(n*sxx - sx*sx, 0)) * sx) / n"
        "   AS intercept"
        " FROM s"
    ),
    "agg_mode": (
        "WITH c AS (SELECT user_id, event_type, count(*) AS cnt"
        "           FROM events GROUP BY 1, 2)"
        " SELECT user_id,"
        " arg_min(event_type, lpad(CAST(100000000 - cnt AS VARCHAR), 12, '0')"
        "         || event_type) AS mode_type,"
        " max(cnt) AS mode_cnt"
        " FROM c GROUP BY user_id"
    ),
    "evt_cumulative_users": (
        "WITH fs AS (SELECT user_id, min(CAST(date_trunc('day',"
        "   CAST(ts AS TIMESTAMP)) AS DATE)) AS d FROM events"
        "   GROUP BY user_id),"
        " days AS (SELECT DISTINCT CAST(date_trunc('day',"
        "   CAST(ts AS TIMESTAMP)) AS DATE) AS day FROM events),"
        " nu AS (SELECT d, count(*) AS new_users FROM fs GROUP BY d)"
        " SELECT day, coalesce(new_users, 0) AS new_users,"
        " CAST(sum(coalesce(new_users, 0)) OVER (ORDER BY day"
        "   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users"
        " FROM days LEFT JOIN nu ON day = d"
    ),
    # Naive O(days x windows) range join — correct, and exactly what the
    # engine's sweep-line version avoids at scale.
    "evt_active_windows": (
        "WITH u AS (SELECT CAST(o_orderdate AS DATE) AS d FROM orders"
        "           WHERE o_orderpriority = '1-URGENT'),"
        " b AS (SELECT min(d) AS lo, max(d) AS hi FROM u),"
        " spine AS (SELECT CAST(unnest(generate_series("
        "   CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP),"
        "   INTERVAL '1 day')) AS DATE) AS day FROM b)"
        " SELECT s.day, count(u.d) AS open_windows"
        " FROM spine s LEFT JOIN u"
        " ON s.day >= u.d AND s.day < u.d + INTERVAL '3 days'"
        " GROUP BY s.day"
    ),
    "evt_latest_snapshot": (
        "WITH k AS (SELECT *,"
        "   lpad(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS VARCHAR), 20, '0')"
        "   || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ok FROM events)"
        " SELECT user_id, arg_max(CAST(ts AS TIMESTAMP), ok) AS ts,"
        " arg_max(event_id, ok) AS event_id,"
        " arg_max(event_type, ok) AS event_type,"
        " arg_max(value, ok) AS value"
        " FROM k GROUP BY user_id"
    ),
    "agg_time_window": (
        "SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))"
        "   AS win_start,"
        " time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))"
        "   + INTERVAL '15 minutes' AS win_end,"
        " COUNT(*) AS n_events,"
        " CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value"
        " FROM events GROUP BY 1, 2"
    ),
    "agg_histogram": (
        "SELECT LEAST(GREATEST(CAST(FLOOR(value / 10) AS INTEGER), 0), 9)"
        "   AS bucket,"
        " COUNT(*) AS cnt, MIN(value) AS min_v, MAX(value) AS max_v"
        " FROM events GROUP BY 1"
    ),
    "win_sessionize": (
        "WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,"
        "            value FROM events),"
        " l AS (SELECT *, LAG(ts) OVER (PARTITION BY user_id"
        "        ORDER BY ts, event_id) AS pts FROM e),"
        " g AS (SELECT *, CAST(SUM(CASE WHEN pts IS NULL"
        "         OR ts - pts >= INTERVAL '30 minutes' THEN 1 ELSE 0 END)"
        "       OVER (PARTITION BY user_id ORDER BY ts, event_id"
        "             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid FROM l)"
        " SELECT user_id, sid, MIN(ts) AS session_start, MAX(ts) AS session_end,"
        " COUNT(*) AS n_events,"
        " CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value"
        " FROM g GROUP BY user_id, sid"
    ),
    "evt_funnel": (
        "WITH su AS (SELECT user_id,"
        "  MIN(CASE WHEN event_type = 'signup' THEN CAST(ts AS TIMESTAMP) END)"
        "    AS signup_ts FROM events GROUP BY user_id),"
        " pu AS (SELECT e.user_id, su.signup_ts,"
        "  MIN(CASE WHEN e.event_type = 'purchase'"
        "       AND CAST(e.ts AS TIMESTAMP) > su.signup_ts"
        "       THEN CAST(e.ts AS TIMESTAMP) END) AS purchase_ts"
        "  FROM events e JOIN su ON e.user_id = su.user_id"
        "  GROUP BY e.user_id, su.signup_ts)"
        " SELECT user_id, signup_ts, purchase_ts,"
        " signup_ts IS NOT NULL AS reached_signup,"
        " purchase_ts IS NOT NULL AS converted FROM pu"
    ),
    "evt_dau": (
        "SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,"
        " COUNT(DISTINCT user_id) AS dau, COUNT(*) AS n_events,"
        " CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value"
        " FROM events GROUP BY 1"
    ),
    "iot_downsample": (
        "SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,"
        " user_id AS device_id, COUNT(*) AS n_readings,"
        " CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(value)"
        "   AS avg_value,"
        " MIN(value) AS min_value, MAX(value) AS max_value"
        " FROM events GROUP BY 1, 2"
    ),
    "iot_anomaly": (
        "WITH s AS (SELECT user_id,"
        "  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sx,"
        "  CAST(SUM(CAST(value AS DECIMAL(18,4))"
        "           * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sx2,"
        "  CAST(COUNT(value) AS DOUBLE) AS n FROM events GROUP BY user_id)"
        " SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts, e.value,"
        " ROUND((e.value - s.sx / s.n)"
        "       / SQRT((s.sx2 - s.sx * s.sx / s.n) / (s.n - 1.0)), 4) AS z"
        " FROM events e JOIN s ON e.user_id = s.user_id"
        " WHERE ABS((e.value - s.sx / s.n)"
        "       / SQRT((s.sx2 - s.sx * s.sx / s.n) / (s.n - 1.0))) > 2.5"
    ),
    "evt_retention": (
        "WITH wk AS (SELECT DISTINCT"
        "  date_trunc('week', CAST(ts AS TIMESTAMP)) AS week, user_id"
        "  FROM events)"
        " SELECT a.week AS week, COUNT(*) AS active_users,"
        " COUNT(b.user_id) AS retained_next_week"
        " FROM wk a LEFT JOIN wk b"
        " ON b.week = a.week + INTERVAL '7 days' AND b.user_id = a.user_id"
        " GROUP BY a.week"
    ),
}
