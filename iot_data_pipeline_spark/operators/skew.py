"""Skew mitigation helpers: salting for hot keys.

AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
default in this engine) splits oversized partitions at runtime and is the
first line of defense. Salting is the explicit fallback for the cases AQE
can't fix — hot keys in aggregations (one reducer owns the key) and
broadcast-ineligible skewed joins — and these helpers make it a one-liner
while keeping results EXACTLY equal to the unsalted plan (asserted in
tests/test_skew.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iot_data_pipeline_spark.operators._util import table


def salted_count(df: DataFrame, key: str, n_salts: int = 8) -> DataFrame:
    """Two-phase count per key: pre-aggregate on (key, salt) so a hot key's
    rows spread over ``n_salts`` reducers, then merge the partials. The
    second shuffle moves ≤ n_salts rows per key regardless of skew."""
    salted = df.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_pc"))
    return partial.groupBy(key).agg(F.sum("_pc").alias("cnt"))


def salted_sum(
    df: DataFrame, key: str, value: Column | str, n_salts: int = 8
) -> DataFrame:
    """Two-phase decimal-exact sum per key under skew (same shape as
    salted_count; any algebraic aggregate decomposes this way)."""
    v = F.col(value) if isinstance(value, str) else value
    salted = df.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    partial = salted.groupBy(key, "_salt").agg(
        F.sum(v.cast("decimal(18,4)")).alias("_ps")
    )
    return partial.groupBy(key).agg(
        F.sum("_ps").cast("double").alias("total")
    )


def salted_join(
    big: DataFrame, small: DataFrame, key: str, n_salts: int = 8
) -> DataFrame:
    """Skewed equi-join: salt the big side's key randomly-but-deterministically,
    replicate the small side once per salt, join on (key, salt). Each hot
    key's rows land on n_salts reducers instead of one. Result is the plain
    inner join's result (salt columns dropped).

    Use when the small side is too big to broadcast and AQE's skew split is
    insufficient (e.g. one key is >10% of the big side)."""
    salted_big = big.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    exploded_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_big.join(exploded_small, [key, "_salt"]).drop("_salt")


def bounded_topk(
    df: DataFrame, key: str, order_cols: list[Column], k: int = 3
) -> DataFrame:
    """Skew-resilient top-k per key: a per-(key, input-partition) partial
    top-k bounds every global window partition at k·n_input_partitions rows
    before the global rank runs — the window analogue of map-side combine.

    Correct for ANY input partitioning: every row of the true global top-k
    is, a fortiori, within its own input partition's top-k, so the partial
    prune never drops a winner; ranks are then re-derived on the pruned set,
    where the surviving rows keep their relative order. ``order_cols`` must
    be a total order per key (unique tiebreak) for deterministic output.

    This is the shape that survives a hot window key at 100 TB: a window
    partition is indivisible — AQE's skew-split cannot touch it (it splits
    JOIN partitions) — so the plain rank-then-filter's single hot partition
    eventually exceeds one executor's sort budget. Here the first window's
    partition key includes ``spark_partition_id()`` — a free salt that Spark
    marks NONDETERMINISTIC (a row's id can change if its partition is
    recomputed on stage retry/loss). Under a COMPLETE assignment (every row
    routed exactly once) any partition-id labeling preserves the true top-k,
    because every global winner is within whatever partition it lands in —
    but the plan SHARES rand()-salting's partial-recompute hazard, it does
    not escape it: if only some map tasks re-execute, a row whose partition
    id changed routes to a different (key, salt) reducer than on its first
    attempt, and reducers that consumed different map attempts can lose or
    double-count rows, which can change the emitted top-k. The mitigation is
    full-stage retry of consumers on map-output loss (Spark's recompute
    handling for non-deterministic stages), not any property of this plan.
    It spreads the hot key across reducers, and the second
    window sees at most k rows per key per input partition however hot the
    key is. Probe (tools_skew_probe.py, NOTES_r08): at 25x/125x with 20% of
    rows on one key the plain window is still inside parallel headroom and
    this variant costs one extra pass — use it when a key's row count
    approaches a single executor's capacity, not before.

    The result adds (or REPLACES) a ``rn`` rank column; a pre-existing
    ``rn`` or internal-name collision raises rather than silently
    overwriting caller data."""
    for col in ("rn", "__btk_p", "__btk_rn"):
        if col in df.columns:
            raise ValueError(
                f"bounded_topk: input already has a {col!r} column — rename "
                "it first (rn is the output rank; __btk_* are internal)"
            )
    part = df.withColumn("__btk_p", F.spark_partition_id())
    wp = Window.partitionBy(key, "__btk_p").orderBy(*order_cols)
    pruned = (
        part.withColumn("__btk_rn", F.row_number().over(wp))
        .where(F.col("__btk_rn") <= k)
        .drop("__btk_p", "__btk_rn")
    )
    w = Window.partitionBy(key).orderBy(*order_cols)
    return pruned.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)


def skew_topk_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-3 events per user via the bounded two-phase top-k. The oracle
    is the PLAIN window top-k SQL — proving the partial prune changes the
    physical bound and nothing else. (ts DESC, event_id) is a total order
    (event_id unique), so ranks are deterministic."""
    e = table(spark, sf_dir, "events")
    return bounded_topk(
        e, "user_id", [F.col("ts").desc(), F.col("event_id")], k=3
    ).select("user_id", "event_id", "rn")


def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase sum+count per user over events — the hot-key
    aggregation pattern, registered so the oracle proves the salted plan is
    EXACTLY the unsalted answer (decimal partials make the merge exact).
    The second shuffle moves ≤ n_salts rows per key however skewed the
    input."""
    e = table(spark, sf_dir, "events")
    salted = e.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(8))
    )
    partial = salted.groupBy("user_id", "_salt").agg(
        F.count(F.lit(1)).alias("_pc"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("_ps"),
    )
    return partial.groupBy("user_id").agg(
        F.sum("_pc").alias("n_events"),
        F.sum("_ps").cast("double").alias("total_value"),
    )


def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skewed equi-join registered as a query: events (big, possibly
    hot-keyed) joined to the customer dimension on user_id with the big
    side salted 8 ways and the small side replicated per salt — each hot
    key fans out over 8 reducers. The oracle is the PLAIN join, proving
    salting changes the physical distribution and nothing else."""
    e = table(spark, sf_dir, "events")
    dim = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(e, dim, "user_id")
    return joined.select("event_id", "user_id", "c_mktsegment", "value")


QUERIES = {
    "skew_salted_agg": skew_salted_agg,
    "skew_salted_join": skew_salted_join,
    "skew_topk_bounded": skew_topk_bounded,
}

ORACLES = {
    "skew_salted_agg": (
        "SELECT user_id, COUNT(*) AS n_events,"
        " CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value"
        " FROM events GROUP BY user_id"
    ),
    "skew_salted_join": (
        "SELECT event_id, user_id, c_mktsegment, value"
        " FROM events JOIN customer ON user_id = c_custkey"
    ),
    "skew_topk_bounded": (
        "SELECT user_id, event_id, rn FROM ("
        "  SELECT user_id, event_id,"
        "  ROW_NUMBER() OVER (PARTITION BY user_id"
        "                     ORDER BY ts DESC, event_id) AS rn"
        "  FROM events) WHERE rn <= 3"
    ),
}
