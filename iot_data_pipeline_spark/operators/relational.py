"""Relational core: scans, projections, filters, joins, aggregations,
windows, sorts, set ops — every operator is declarative DataFrame API so
Catalyst picks the physical strategy (broadcast vs shuffle join, partial
aggregation, TakeOrderedAndProject, AQE re-planning at runtime).

Each query is a pure ``(spark, sf_dir) -> DataFrame``; the matching DuckDB
oracle SQL lives in ``ORACLES`` under the same key (SURVEY.md §2B ids).

Scale notes are inline per operator: at 100 TB the same plans hold because
every join/agg keys on high-cardinality uniformly-distributed columns, small
dimension tables are broadcast explicitly, and nothing collects to the driver.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iot_data_pipeline_spark.functions.transforms import (
    blank_to_null,
    normalize_columns,
)
from iot_data_pipeline_spark.operators._util import (
    davg,
    dec,
    dsum,
    dsum_prod,
    sql_davg,
    sql_dsum,
    sql_dsum_prod,
    table,
)

# ---------------------------------------------------------------------------
# Scans / sinks (reference S1/S2/S5; SURVEY.md §2B "Scans / sources / sinks")
# ---------------------------------------------------------------------------


def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain parquet scan of ``supplier`` (full projection). Column pruning /
    predicate pushdown are exercised by the filter queries below."""
    return table(spark, sf_dir, "supplier")


def sink_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference S2: ``write.mode('overwrite').parquet`` then read back.
    The oracle checks the round trip is lossless (== source table)."""
    df = table(spark, sf_dir, "nation")
    out = tempfile.mkdtemp(prefix="sink_parquet_") + "/nation"
    df.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


# ---------------------------------------------------------------------------
# Projections / filters (reference P1/P2, F4-F6)
# ---------------------------------------------------------------------------


def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rename-all projection (reference P1): dotted/hyphenated names →
    underscores, then a column subset. Metadata-only — no job until action."""
    df = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("c.custkey"),
        F.col("c_name").alias("c-name"),
        F.col("c_mktsegment").alias("c.mkt-segment"),
    )
    return normalize_columns(df)


def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate: ``=``, ``<``, ``IN``, ``LIKE``, ``AND/OR/NOT``.
    All of it reaches the parquet scan as PushedFilters."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") == "F")
        & (F.col("o_totalprice") < 150000.0)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_orderpriority").like("%H%")
        & ~F.col("o_orderstatus").isNull()
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")


def filter_null_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empty-string→NULL normalization then null-predicate filter
    (reference F6 pattern on the ``events.event_type`` analog)."""
    e = table(spark, sf_dir, "events")
    normed = e.withColumn("event_type", blank_to_null(F.col("event_type")))
    return normed.filter(F.col("event_type").isNotNull()).select(
        "event_id", "event_type", "user_id"
    )


def project_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested CASE WHEN including a no-otherwise branch (→ NULL), the
    reference's F4 conditional shape."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debtor")
        .when(
            F.col("c_acctbal") < 5000,
            F.when(F.col("c_mktsegment") == "BUILDING", "building-small").otherwise(
                "small"
            ),
        )
        .otherwise("large")
        .alias("tier"),
        # when-without-otherwise → NULL for non-matches (quirk-faithful F4).
        F.when(F.col("c_acctbal") > 9000, F.lit("vip")).alias("vip_flag"),
    )


def project_cast_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts + arithmetic (the duration-seconds computation shape, F2-F3):
    charge = extendedprice * (1 - discount) * (1 + tax), decimal-exact."""
    li = table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(18,4)")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("int").alias("qty_int"),
        (dec("l_extendedprice") * (one - dec("l_discount")))
        .cast("double")
        .alias("disc_price"),
        (dec("l_extendedprice") * (one - dec("l_discount")) * (one + dec("l_tax")))
        .cast("double")
        .alias("charge"),
    )


# ---------------------------------------------------------------------------
# Joins. Catalyst chooses broadcast-hash for the small sides automatically
# under AQE; the explicit broadcast() hint is exercised by join_broadcast.
# ---------------------------------------------------------------------------


def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer on custkey. At scale: shuffle-hash/sort-merge on the
    uniformly distributed key; at these SFs AQE converts to broadcast."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_custkey", "c_name", "c_mktsegment", "o_totalprice"
    )


def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ broadcast(part): explicit hint — part is a dimension table
    that fits in every executor, so the fact side never shuffles."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_orderkey", "l_linenumber", "p_brand", "p_type", "l_quantity"
    )


def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer LEFT JOIN orders — preserves customers with no orders
    (null o_orderkey)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_orderstatus"
    )


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation FULL OUTER supplier on nationkey: unmatched rows on both sides
    survive with nulls."""
    n = table(spark, sf_dir, "nation")
    s = table(spark, sf_dir, "supplier")
    return n.join(s, n.n_nationkey == s.s_nationkey, "full").select(
        "n_nationkey", "n_name", "s_suppkey", "s_name"
    )


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having ≥1 order (left_semi: no row multiplication, the
    probe side streams — cheapest existence join at scale)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no high-value order (left_anti against a filtered
    build side — the filter is pushed below the join)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi band join: same-brand part pairs whose retail prices are
    within 5.0 of each other, as a BANDED BUCKET join — the scalable shape
    for band joins. Each row gets a price bucket of the band width
    (``floor(price / 5)``, decimal-exact); one side additionally probes
    its two adjacent buckets via a 3-element explode. Any pair within the
    band shares a (brand, bucket) probe — if ``|a − b| ≤ w`` then their
    ``floor(·/w)`` buckets differ by at most 1 (exact under decimal
    arithmetic) — so the equi-join on (brand, bucket) is lossless and the
    exact band predicate runs only on bucket-local candidates. This turns
    the per-brand all-pairs residual scan (quadratic in brand group size)
    into band-local work that scales with pair density, the same
    candidate-pruning idea as the LSH banding in llm_dedup_near."""
    band = F.lit(5.0).cast("decimal(18,4)")
    p = table(spark, sf_dir, "part")
    bkt = F.floor(dec("p_retailprice") / band).cast("long")
    p1 = p.select(
        F.col("p_partkey").alias("partkey_a"),
        F.col("p_brand"),
        dec("p_retailprice").alias("price_a"),
        F.explode(
            F.array(bkt - 1, bkt, bkt + 1)
        ).alias("bkt"),
    ).alias("p1")
    p2 = p.select(
        F.col("p_partkey").alias("partkey_b"),
        F.col("p_brand").alias("brand_b"),
        dec("p_retailprice").alias("price_b"),
        bkt.alias("bkt"),
    ).alias("p2")
    return (
        p1.join(
            p2,
            (F.col("p_brand") == F.col("brand_b"))
            & (F.col("p1.bkt") == F.col("p2.bkt"))
            & (F.col("partkey_a") < F.col("partkey_b"))
            & (F.abs(F.col("price_a") - F.col("price_b")) <= band),
        )
        .select("partkey_a", "partkey_b", "p_brand")
    )


def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way chain region→nation→customer→orders→lineitem with group-by
    revenue per region (TPC-H Q5 shape). Dimension sides broadcast; the two
    fact tables join on their natural keys. Revenue is decimal-exact."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(18,4)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            dsum_prod(
                dec("l_extendedprice") * (one - dec("l_discount")), "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def join_asof_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest event at-or-before each order's date for the
    order's customer (events.user_id ≡ o_custkey).

    Spark has no native as-of join, and the naive range join explodes. The
    scalable formulation is union-and-scan: tag both streams, sort within
    user partitions by (ts, tag, event_id), and carry the last event id
    forward with last_value(ignorenulls) — ONE shuffle on user_id, linear
    scan, no row multiplication. This holds at 100 TB because state per
    partition is one value.
    """
    o = table(spark, sf_dir, "orders")
    e = table(spark, sf_dir, "events")
    orders_side = o.select(
        F.col("o_orderkey"),
        F.col("o_custkey").alias("uid"),
        F.col("o_orderdate").alias("ts"),
        F.lit(None).cast("long").alias("ev_id"),
        F.lit(1).alias("is_order"),
    )
    events_side = e.select(
        F.lit(None).cast("long").alias("o_orderkey"),
        F.col("user_id").alias("uid"),
        F.col("ts"),
        F.col("event_id").alias("ev_id"),
        F.lit(0).alias("is_order"),
    )
    u = orders_side.unionByName(events_side)
    w = (
        Window.partitionBy("uid")
        .orderBy("ts", "is_order", "ev_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn(
        "last_event_id",
        F.last(F.when(F.col("is_order") == 0, F.col("ev_id")), ignorenulls=True).over(
            w
        ),
    )
    return carried.filter(F.col("is_order") == 1).select(
        "o_orderkey",
        F.col("uid").alias("o_custkey"),
        F.col("ts").alias("o_orderdate"),
        "last_event_id",
    )


def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap JOIN banded on the calendar grid: pairs of orders
    from the same customer whose activity windows [orderdate, orderdate +
    3 + o_orderkey % 11 days] overlap — the interval × interval shape the
    registry's adjacent operators do NOT cover (join_asof_event is
    point→latest-point, join_theta_range is a scalar band,
    evt_active_windows is a sweep-line COUNT that never forms pairs).

    Scalable shape (the same grid-banding idea databases use for range
    joins): each interval explodes into the calendar MONTHS it covers
    (≤ 2 cells for a ≤ 14-day window), the join is a plain equi-join on
    (custkey, month_cell), and each overlapping pair is emitted EXACTLY
    once — in the month of the later start, which both intervals provably
    cover — so no dedup shuffle is needed. Work scales with cell-local
    pair density, never per-customer all-pairs; the exact overlap
    predicate runs only on cell-local candidates."""
    o = table(spark, sf_dir, "orders")
    iv = o.select(
        "o_orderkey",
        "o_custkey",
        F.to_date("o_orderdate").alias("s"),
        F.date_add(
            F.to_date("o_orderdate"),
            (F.lit(3) + F.col("o_orderkey") % 11).cast("int"),
        ).alias("e"),
    )
    cells = iv.withColumn(
        "cell",
        F.explode(
            F.sequence(
                F.trunc("s", "MM"), F.trunc("e", "MM"), F.expr("interval 1 month")
            )
        ),
    )
    a = cells.select(
        F.col("o_custkey").alias("custkey"),
        "cell",
        F.col("o_orderkey").alias("a_orderkey"),
        F.col("s").alias("a_start"),
        F.col("e").alias("a_end"),
    )
    b = cells.select(
        F.col("o_custkey").alias("custkey"),
        "cell",
        F.col("o_orderkey").alias("b_orderkey"),
        F.col("s").alias("b_start"),
        F.col("e").alias("b_end"),
    )
    return (
        a.join(b, ["custkey", "cell"])
        .filter(
            (F.col("a_orderkey") < F.col("b_orderkey"))
            & (F.col("a_start") <= F.col("b_end"))
            & (F.col("b_start") <= F.col("a_end"))
            # once-only emission: the later start's month is covered by
            # BOTH intervals, so exactly one shared cell survives
            & (
                F.col("cell")
                == F.greatest(
                    F.trunc("a_start", "MM"), F.trunc("b_start", "MM")
                )
            )
        )
        .select(
            "custkey",
            "a_orderkey",
            "b_orderkey",
            (
                F.datediff(
                    F.least("a_end", "b_end"), F.greatest("a_start", "b_start")
                )
                + 1
            ).alias("overlap_days"),
        )
    )


_BLOOM_M, _BLOOM_K = 1 << 17, 5  # floor: 131072 bits (2048 longs), 5 probes
_BLOOM_M_CAP = 1 << 21  # literal-TIER ceiling: 32768 longs ≈ 256 KB of plan
_BLOOM_BC_CAP = 1 << 30  # broadcast-variable tier ceiling: 128 MB bitset
_BLOOM_CHUNK_WORDS = 2048  # words per collected blob: 16 KB fixed-size chunks


def bloom_filter_bits(
    build: DataFrame, key: str, m: int | None = None, k: int = _BLOOM_K
):
    """Bloom bitset over the build side's join keys as a numpy uint64
    array: each key sets ``k`` bits at ``pmod(xxhash64(key, seed), m)``.

    The fold is fully ENGINE-side and CHUNKED: per-word BIT_OR of the
    position bits (OR is idempotent, so duplicate positions need no
    distinct pass — r17 dropped the distinct shuffle; the word
    aggregation partial-aggregates map-side) → per-chunk fixed-size
    16 KB binary blobs (``_BLOOM_CHUNK_WORDS`` words each).
    Blob assembly is LINEAR in the chunk size: the chunk's occupied words
    arrive as a SORTED entry array and gaps are zero-filled by a
    zip-with-previous pass (array_repeat per gap), then one
    transform+array_join over hex — never a per-index ``element_at`` on a
    map, which is a linear scan per lookup in Spark and made the
    assembly O(c²) per chunk (measured 13–18 s at m=2^24; this form is
    1.9 s, bit-identical). The driver therefore collects at most
    ``m/(64·2048)`` binary rows — 8192 blobs at the 2^30 cap — instead of
    up to m/64 = 16.7M individual word Rows; all-zero chunks produce no
    row at all, so a sparse bitset collects only its occupied chunks.

    With ``m=None`` the bitset AUTO-SIZES to the build NDV (≈ 10 bits per
    key for ~1% FPR, power-of-two, floored at ``_BLOOM_M``, capped at
    ``_BLOOM_BC_CAP`` — the ndv ≈ 10^8 regime) so a bigger build side
    cannot silently saturate the filter into a no-op; beyond the cap the
    FPR degrades gracefully and results stay exact either way. The
    sizing pass is ``approx_count_distinct`` — an HLL register-merge
    aggregate (order-insensitive, so still deterministic) that never
    shuffles keys; m only tunes the FPR, results don't depend on it."""
    import numpy as np

    if m is None:
        ndv = build.agg(F.approx_count_distinct(key).alias("n")).first()["n"]
        m = _BLOOM_M
        while m < min(10 * max(int(ndv), 1), _BLOOM_BC_CAP):
            m *= 2
    if m % 64 != 0:
        # probers re-derive m as len(words)*64 — a non-multiple would set
        # bits the probe side never tests (silent false negatives)
        raise ValueError(f"bloom m must be a multiple of 64, got {m}")
    n_words = m // 64
    c = min(_BLOOM_CHUNK_WORDS, n_words)  # last chunk may be partial (clipped below)
    # r17 (guide §2.3/§2.4): fold duplicate positions with BIT_OR instead
    # of distinct + SUM-of-distinct-powers — identical bits (OR is
    # idempotent, so no distinct pass is needed, and bit 63 needs no
    # signed-overflow argument), one FEWER full shuffle, and the word
    # aggregation now partial-aggregates map-side, so the one remaining
    # position exchange carries at most m/64 word rows per mapper instead
    # of every distinct position.
    pos = build.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key), F.lit(s)), F.lit(m))
                    for s in range(k)
                ]
            )
        ).alias("pos")
    )
    # sorted occupied entries + zip-with-previous gap fill: prepend a
    # sentinel at index -1, pair each entry with its predecessor, emit
    # (gap zeros, word) per pair, pad the tail to c words — every step
    # linear in the chunk, and slice(es, 1, size-1) is empty for a
    # single-entry chunk so the sentinel pairs with the first entry.
    blob_expr = f"""
      unhex(array_join(transform(
        concat(
          flatten(zip_with(
            es,
            concat(array(struct(cast(-1 as int) as i, cast(0 as bigint) as bits)),
                   slice(es, 1, size(es) - 1)),
            (e, p) -> concat(array_repeat(cast(0 as bigint), e.i - p.i - 1),
                             array(e.bits))
          )),
          array_repeat(cast(0 as bigint), {c} - 1 - element_at(es, -1).i)
        ),
        w -> lpad(hex(w), 16, '0')), ''))
    """
    chunk_rows = (
        pos.groupBy(F.floor(F.col("pos") / 64).cast("bigint").alias("w"))
        .agg(
            F.bit_or(
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))"
                )
            ).alias("bits")
        )
        .groupBy((F.col("w") / c).cast("bigint").alias("chunk"))
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.pmod(F.col("w"), F.lit(c)).cast("int").alias("i"),
                        F.col("bits"),
                    )
                )
            ).alias("es")
        )
        .select("chunk", F.expr(blob_expr).alias("blob"))
        .collect()
    )
    bits = np.zeros(n_words, dtype=np.uint64)
    for r in chunk_rows:
        lo = int(r["chunk"]) * c
        # every blob is tail-padded to exactly c words, but when c does not
        # divide n_words (an explicit non-power-of-two m, e.g. 192 KB) the
        # LAST chunk owns fewer than c words — clip to the destination
        # (padding past n_words is provably zero: positions are < m)
        seg = bits[lo : lo + c]
        seg[:] = np.frombuffer(r["blob"], dtype=">u8")[: len(seg)]
    return bits


def bloom_filter_words(
    build: DataFrame, key: str, m: int | None = None, k: int = _BLOOM_K
) -> list[int]:
    """Literal-tier convenience wrapper over :func:`bloom_filter_bits`:
    the bitset as ``m/64`` SIGNED int64 words, the form a plan array
    literal needs. Only sensible while m stays literal-sized (≤ 2^21);
    the broadcast tier consumes the numpy array directly."""
    import numpy as np

    bits = bloom_filter_bits(build, key, m=m, k=k)
    return [int(w) for w in bits.view(np.int64)]


def bloom_might_contain(key_col, words: list[int], k: int = _BLOOM_K):
    """Membership predicate against a Bloom bitset literal: all ``k``
    probed bits set ⇒ maybe-member (false positives possible, false
    negatives impossible). Pure Catalyst — ``getbit`` over an
    ``element_at`` of the word-array literal — so the predicate stays
    inside whole-stage codegen and is pushable below joins."""
    m = len(words) * 64
    # explicit element type: an all-zero bitset would otherwise infer
    # array<int>, whose getbit range is [0, 32)
    bitset = F.lit(words).cast("array<bigint>")
    pred = None
    for s in range(k):
        p = F.pmod(F.xxhash64(key_col, F.lit(s)), F.lit(m))
        word = F.element_at(bitset, F.floor(p / 64).cast("int") + 1)
        hit = F.getbit(word, F.pmod(p, F.lit(64))) == 1
        pred = hit if pred is None else pred & hit
    return pred


def _bloom_as_uint64(words):
    """Normalize a bitset given as signed-int64 list OR numpy uint64 array
    to the uint64 array the broadcast tier ships."""
    import numpy as np

    if isinstance(words, np.ndarray):
        if words.dtype == np.int64:
            # Bit REINTERPRETATION, not value conversion: astype on signed
            # negatives relies on numpy's value-wrap behavior (which numpy
            # has been tightening); view is the exact intended cast.
            return words.view(np.uint64)
        return words.astype(np.uint64, copy=False)
    return np.array(words, dtype=np.int64).view(np.uint64)


def bloom_might_contain_bc(spark: SparkSession, key_col, words,
                           k: int = _BLOOM_K):
    """Broadcast-variable tier of the Bloom probe, for bitsets too big for
    a plan literal (m > ``_BLOOM_M_CAP``): the words ship ONCE per
    executor as a real Spark broadcast (128 MB at ``_BLOOM_BC_CAP``), bit
    positions are still computed JVM-side with the SAME ``xxhash64``
    expressions as the build (so hashing can never diverge between
    build and probe), and only the gather-and-test runs in a vectorized
    Arrow-batched pandas UDF over the k-position array column
    (:func:`_arrow_udfs.make_bloom_test_udf` — hint-based API, empty-batch
    safe). Same contract as :func:`bloom_might_contain`: no false
    negatives."""
    from iot_data_pipeline_spark.operators._arrow_udfs import (
        make_bloom_test_udf,
    )

    bits = _bloom_as_uint64(words)
    m = len(bits) * 64
    bc = spark.sparkContext.broadcast(bits)
    test = make_bloom_test_udf(bc)
    pos_arr = F.array(
        *[F.pmod(F.xxhash64(key_col, F.lit(s)), F.lit(m)) for s in range(k)]
    )
    return test(pos_arr)


def bloom_prefilter_pred(spark: SparkSession, key_col, words,
                         k: int = _BLOOM_K):
    """Tier dispatch for the Bloom probe: codegen literal+getbit while the
    bitset fits a plan literal, vectorized broadcast-variable tier above.
    Accepts the bitset as a signed-int64 list or a numpy uint64 array."""
    import numpy as np

    if len(words) * 64 <= _BLOOM_M_CAP:
        as_list = (
            [int(w) for w in words.view(np.int64)]
            if isinstance(words, np.ndarray)
            else words
        )
        return bloom_might_contain(key_col, as_list, k)
    return bloom_might_contain_bc(spark, key_col, words, k)


def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter join pre-reduction — the shuffle-volume killer
    for selective fact⋈fact joins at 100 TB: a selective predicate keeps
    ~8% of orders, whose orderkeys are Bloom-summarized into an NDV-auto-
    sized bitset — 16 KB floor, 128 MB cap (:func:`bloom_filter_bits`,
    collected as ≤ m/(64·2048) fixed-size 16 KB binary chunks) — and the
    probe side (lineitem) is filtered by
    :func:`bloom_prefilter_pred` BEFORE the exact shuffle join, so ~92%
    of the big side never enters the exchange. The probe is TWO-tier:
    codegen literal+getbit while the bitset fits a plan literal
    (m ≤ 2^21), and a vectorized Arrow bit-test over a real broadcast
    variable above that (build ndv ≳ 200k — positions still computed
    JVM-side with the same xxhash64, so hashing can never diverge).
    Correctness never depends on the sketch: Bloom filters admit false
    positives but no false negatives, so the exact equi-join after the
    prefilter returns precisely the plain-join rows — the oracle IS the
    plain join.

    At 100 TB the build side's keyset is far too big to broadcast as a
    hash relation, but its Bloom summary broadcasts at any scale; an
    UNDERSIZED m only raises the false-positive rate toward a no-op
    prefilter — results stay exact. Spark's own
    ``spark.sql.optimizer.runtime.bloomFilter.enabled`` injects this
    same shape automatically when stats justify it; this operator is the
    explicit, stats-independent form. The executed plan (plan-tested)
    shows the getbit predicate as a Filter directly on the lineitem scan,
    below the join."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    build = o.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 300000)
    )
    bits = bloom_filter_bits(build, "o_orderkey")
    pre = li.filter(bloom_prefilter_pred(spark, F.col("l_orderkey"), bits))
    one = F.lit(1).cast("decimal(18,4)")
    return (
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


def join_dpp_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning — the PARTITION-level runtime filter that
    completes the family (``sink_parquet_partitioned`` = static pruning
    from a literal predicate; ``join_bloom_prefilter`` = row-level runtime
    filter): the fact table is laid out partitioned by order year, the
    dimension is filtered on a NON-partition attribute (``era``), and
    Catalyst injects the dim's surviving join keys into the fact scan's
    PartitionFilters at RUNTIME — ``dynamicpruningexpression(o_year IN
    dynamicpruning#N)`` reuses the broadcast exchange, so fact partitions
    for other years are never listed or read (plan-tested).

    At 100 TB this is the canonical star-join access path: the date/tenant
    partition column can't be filtered statically (the predicate lives on
    dim attributes), and without DPP the fact scan reads the lake. The
    write here exists to create the partitioned layout at test scale; in
    production the fact already lives partitioned. Pruning is semantics-
    preserving, so the oracle is the plain year-join."""
    o = table(spark, sf_dir, "orders")
    out = tempfile.mkdtemp(prefix="dpp_orders_") + "/orders_by_year"
    (
        o.withColumn("o_year", F.year("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(out)
    )
    fact = spark.read.parquet(out)
    dim = spark.createDataFrame(
        [(y, "current" if y == 1997 else "historical") for y in range(1995, 2002)],
        "d_year INT, era STRING",
    )
    return (
        fact.join(
            dim.filter(F.col("era") == "current"),
            fact.o_year == F.col("d_year"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# Aggregations (partial+final hash agg with codegen — planner-chosen)
# ---------------------------------------------------------------------------


def agg_count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference Q1: SELECT count(*). Parquet aggregate pushdown answers this
    from footer metadata without scanning data pages."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(F.count(F.lit(1)).alias("cnt"))


def agg_groupby_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape — the reference's label-taxonomy group-by analog
    (README.md:64-80): per (returnflag, linestatus) counts/sums/avgs.
    Map-side partial aggregation makes the shuffle tiny (|groups| rows)."""
    li = table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(18,4)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
        dsum_prod(
            dec("l_extendedprice") * (one - dec("l_discount")), "sum_disc_price"
        ),
        davg("l_quantity", "avg_qty"),
        davg("l_extendedprice", "avg_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """countDistinct over two keys (expand + two-phase distinct agg)."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("d_part"),
        F.countDistinct("l_suppkey").alias("d_supp"),
        F.count(F.lit(1)).alias("cnt"),
    )


def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct (rows-only oracle: probabilistic). At 100 TB
    this is the only sane distinct-count — fixed-size sketch, no shuffle of
    raw keys. Engine test asserts ≤2% relative error vs exact."""
    e = table(spark, sf_dir, "events")
    return e.agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
    )


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): subtotal + grand-total rows with
    NULL group keys — one Expand node feeding the same hash aggregate."""
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"), dsum("l_quantity", "sum_qty")
    )


def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group + post-aggregation filter (HAVING)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("order_cnt"), dsum("o_totalprice", "total_spend"))
        .filter(F.col("order_cnt") > 5)
    )


def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution stats over part prices. stddev/variance are computed from
    exact decimal Σx and Σx² so both engines derive them from bit-identical
    doubles (single-pass, still one aggregate); median uses exact
    percentile (Spark) ≡ quantile_cont (DuckDB), rounded."""
    p = table(spark, sf_dir, "part")
    sum_x = F.sum(dec("p_retailprice") * F.lit(1).cast("decimal(18,4)")).cast("double")
    sum_x2 = F.sum(dec("p_retailprice") * dec("p_retailprice")).cast("double")
    n = F.count("p_retailprice").cast("double")
    var = (sum_x2 - sum_x * sum_x / n) / (n - F.lit(1.0))
    return p.agg(
        F.round(var, 4).alias("var_price"),
        F.round(F.sqrt(var), 4).alias("stddev_price"),
        F.round(F.expr("percentile(p_retailprice, 0.5)"), 4).alias("median_price"),
        n.cast("long").alias("n"),
    )


# ---------------------------------------------------------------------------
# Windows
# ---------------------------------------------------------------------------


def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / row_number per customer ordered by totalprice desc
    with the unique orderkey as tiebreak (determinism convention)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w).alias("rn"),
    )


def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer in (orderdate, orderkey) order,
    rowsBetween(unboundedPreceding, currentRow). Decimal-exact prefix sums
    are order-insensitive to engine internals because the frame order is
    total (unique tiebreak key)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gaps via lag(ts): delta in exact integer
    microseconds (unix_micros), so no float drift between engines."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(F.col("ts")).over(w)
    nxt = F.lead(F.col("ts")).over(w)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        (F.unix_micros(F.col("ts")) - F.unix_micros(prev)).alias("gap_us"),
        (F.unix_micros(nxt) - F.unix_micros(F.col("ts"))).alias("lead_us"),
    )


def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by totalprice (row_number ≤ 3). At scale
    this is the rank-then-filter pattern: one shuffle on the group key; AQE
    handles group skew."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# ---------------------------------------------------------------------------
# Sorts / limits / set ops
# ---------------------------------------------------------------------------


def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY … LIMIT k → TakeOrderedAndProject: each partition
    keeps its local top-k, driver merges k·partitions rows — no global sort
    ever materializes, which is why this survives 100 TB."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two overlapping filtered slices (duplicates preserved —
    the hash compare is a multiset, so ALL semantics are verified)."""
    c = table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_acctbal") > 8000).select("c_custkey", "c_name")
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_name")
    return a.unionByName(b)


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) of customer keys vs ordering-customer keys."""
    c = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.intersect(o)


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customer keys minus urgent-order customer keys."""
    c = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return c.subtract(o)


# ---------------------------------------------------------------------------
# SQL-string entry point (reference entry point 3: ad-hoc SQL on the serving
# store, SURVEY.md §3 — here it's spark.sql over registered temp views, the
# same Catalyst lifecycle as the DataFrame path)
# ---------------------------------------------------------------------------

_SQL_Q3 = """
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
            AS DOUBLE) AS revenue,
       o_orderdate,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND l_shipdate > o_orderdate
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 20
"""


_SQL_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
         AS sum_base_price,
       CAST(CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
            * 10000) AS BIGINT) AS DOUBLE) / 10000 AS sum_disc_price,
       CAST(CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))
                * (CAST(1 AS DECIMAL(8,4)) + CAST(l_tax AS DECIMAL(8,4))))
            * 10000) AS BIGINT) AS DOUBLE) / 10000 AS sum_charge,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
             / COUNT(*), 4) AS avg_qty,
       ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
             / COUNT(*), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP_NTZ '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def sql_entry_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary as a SQL string: the canonical scan-heavy
    full-aggregation shape (one pass over the fact table, partial+final agg,
    shuffle carries only |groups| rows). All money sums are decimal-exact
    so results are bit-identical at any partitioning; averages divide the
    exact decimal sum as a double (deterministic operands → deterministic
    quotient)."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_SQL_Q1)


def filter_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT IN subquery predicates through the SQL surface — Catalyst
    rewrites them to semi/anti joins (same physical plans as join_semi /
    join_anti), proving the SQL sugar and the DataFrame API converge."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_acctbal > 5000)
          AND o_orderkey NOT IN (SELECT o_orderkey FROM orders
                                 WHERE o_orderpriority = '1-URGENT')
        """
    )


def sql_entry_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped query submitted as a SQL STRING over temp views —
    proves the SQL surface resolves through the same catalog/optimizer as
    the DataFrame API (identical physical plans either way)."""
    for name in ("customer", "orders", "lineitem"):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_SQL_Q3)


_SQL_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP_NTZ '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def sql_entry_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking, adapted to the testdata
    schema's ``l_shipdate > o_orderdate`` lateness predicate): a correlated
    EXISTS with a NON-equi correlated conjunct. Catalyst decorrelates it to
    a LEFT SEMI join on ``l_orderkey = o_orderkey`` with the inequality as
    the join residual — one shuffle pair, no per-row subquery execution.
    The quarter filter on ``o_orderdate`` is pushed to the orders scan, so
    at 100 TB the probe side is one quarter of orders, not the full table."""
    for name in ("orders", "lineitem"):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_SQL_Q4)


_SQL_Q17 = """
SELECT CAST(CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) * 10000)
       AS BIGINT) AS DOUBLE) / 10000 / 7.0 AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#13'
  AND l_quantity < (SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,4)))
                                       AS DOUBLE) / COUNT(*))
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


def sql_entry_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): a CORRELATED SCALAR
    AGGREGATE subquery (per-part average quantity). Catalyst rewrites it to
    an aggregate over lineitem grouped by ``l_partkey`` joined back to the
    filtered fact — two scans of lineitem but zero nested-loop evaluation;
    with the ``p_brand`` filter pushed into the join the re-aggregated side
    is the only full-table pass. The per-part average uses the exact decimal
    sum so the ``l_quantity <`` threshold is bit-identical across engines
    and partitionings (a double SUM here could flip rows on ulp ties)."""
    for name in ("lineitem", "part"):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_SQL_Q17)


_SQL_Q18 = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey
                     HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 150)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


def sql_entry_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer): IN over a GROUP BY ... HAVING
    subquery. Catalyst turns the IN into a LEFT SEMI join against the
    aggregated keys, so lineitem is aggregated once (partial+final on
    ``l_orderkey``), the surviving keys semi-filter orders, and only then
    do customer/lineitem join in — the top-100 is TakeOrderedAndProject,
    never a global sort. ``o_totalprice DESC, o_orderkey`` makes the limit
    deterministic (stored doubles compare exactly; key breaks ties)."""
    for name in ("customer", "orders", "lineitem"):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_SQL_Q18)


_SQL_Q21 = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate >= l1.l_shipdate)
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20
"""


def sql_entry_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting, adapted: the
    testdata has no commit/receipt dates so "late" is ``l_shipdate >
    o_orderdate`` and the sole-blame test is "no OTHER supplier shipped on
    or after l1's ship date"). Stacks a correlated EXISTS *and* NOT EXISTS
    on the same fact table: Catalyst plans them as a LEFT SEMI then LEFT
    ANTI join, both shuffled on ``l_orderkey`` — three passes over lineitem
    but every one a hash join on the same key, so at scale AQE can reuse
    the exchange. The non-equi parts ride as join residuals, never a
    cartesian."""
    for name in ("supplier", "orders", "lineitem"):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_SQL_Q21)


_SQL_RCTE = """
WITH RECURSIVE walk(start_key, cur_key, depth) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer
  UNION ALL
  SELECT start_key, CAST(FLOOR(cur_key / 10.0) AS BIGINT), depth + 1
  FROM walk WHERE cur_key > 0
)
SELECT start_key, CAST(max(depth) AS BIGINT) AS depth_to_root,
       CAST(count(*) AS BIGINT) AS chain_len
FROM walk GROUP BY start_key
"""


def sql_entry_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (new in Spark 4): per-customer walk up a synthetic
    digit-truncation parent hierarchy (key -> key/10 -> ... -> 0), returning
    depth-to-root and chain length. Each iteration is one distributed step
    over the frontier — Spark executes the recursion as iterated union
    steps (bounded by spark.sql.cteRecursionLevelLimit), the declarative
    twin of the engine's iterative min-label-propagation in
    ``llm_dedup_clusters``. Depth here is ≤ 5, far under the limit."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_SQL_RCTE)


def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-storage co-located join — the pre-shuffle pattern that pays
    for itself at 100 TB: write both fact tables bucketed AND sorted on the
    join key (``bucketBy(8, orderkey).sortBy(orderkey)``), then join the
    catalog tables back. Matching bucket counts mean the join consumes the
    on-disk partitioning directly — the executed plan shows ``Bucketed:
    true`` on both scans and NO Exchange feeding the SortMergeJoin, so a
    nightly pipeline joining these tables N times shuffles them zero times
    instead of N. The ``merge`` hint pins the SMJ at toy scale too (the
    planner would otherwise broadcast the small side and skip the bucket
    path); at production scale SMJ is what it would pick anyway. The final
    per-status aggregate shuffles only |groups| partial rows.

    The bucketed copies live at ONE fixed PER-USER external location that
    every invocation overwrites in place — a fresh mkdtemp per call would
    leak a full copy of both facts each run (bench reps, the robustness
    matrix), and managed tables refuse to re-attach to a warehouse
    directory left by a previous session. The uid suffix (same hazard
    class as ``session._ship_package_to_workers``) keeps two concurrent
    processes/users from overwriting each other's bucketed data mid-query
    — within one user in-place overwrite is preserved, so the no-leak
    property holds. The tables stay registered because the returned
    DataFrame reads them lazily."""
    from iot_data_pipeline_spark.operators._util import per_user_tmp_suffix

    uid = per_user_tmp_suffix()
    base = os.path.join(tempfile.gettempdir(), f"spark_graft_bucketed_{uid}")
    t_orders, t_lineitem = f"bkt_orders_{uid}", f"bkt_lineitem_{uid}"
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
    spark.sql(f"DROP TABLE IF EXISTS {t_lineitem}")
    (
        orders.write.mode("overwrite")
        .format("parquet")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", os.path.join(base, "orders"))
        .saveAsTable(t_orders)
    )
    (
        lineitem.write.mode("overwrite")
        .format("parquet")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", os.path.join(base, "lineitem"))
        .saveAsTable(t_lineitem)
    )
    joined = (
        spark.table(t_orders)
        .hint("merge")
        .join(
            spark.table(t_lineitem),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
    )
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum("l_quantity", "sum_qty"),
            dsum_prod(
                dec("l_extendedprice")
                * (F.lit(1).cast("decimal(18,4)") - dec("l_discount")),
                "revenue",
            ),
        )
        .orderBy("o_orderstatus")
    )


def join_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-≤1 similarity self-join (entity resolution /
    near-identical-string dedup) via the SymSpell deletion-neighborhood:
    each name explodes into itself plus its |len| one-character-deletion
    variants, candidates equi-join on the variant, and the exact
    ``levenshtein`` filter runs ONLY on bucket-local candidates. Any two
    strings within edit distance 1 share a deletion variant (delete the
    differing position on the appropriate side), so the banding is
    lossless — the brute-force all-pairs oracle proves it value-for-value.

    Scale shape: corpus × (len+1) candidate rows, one hash shuffle on the
    variant key, never an all-pairs join — the difference between linear
    and n² at a 100 TB entity table. Variant keys inherit the name's
    uniqueness (shared-prefix deletions keep the distinguishing suffix),
    so the join is skew-free; a pathological hot variant would fall to
    AQE skew-join splitting."""
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    dels = F.transform(
        F.sequence(F.lit(1), F.length("s_name")),
        lambda i: F.concat(
            F.col("s_name").substr(F.lit(1), i - 1),
            F.col("s_name").substr(i + 1, F.length("s_name")),
        ),
    )
    v = s.select(
        "s_suppkey",
        "s_name",
        F.explode(
            F.array_union(F.array(F.col("s_name")), dels)
        ).alias("variant"),
    )
    a = v.select(
        F.col("s_suppkey").alias("suppkey_a"),
        F.col("s_name").alias("name_a"),
        "variant",
    )
    b = v.select(
        F.col("s_suppkey").alias("suppkey_b"),
        F.col("s_name").alias("name_b"),
        "variant",
    )
    return (
        a.join(b, "variant")
        .filter(F.col("suppkey_a") < F.col("suppkey_b"))
        .select("suppkey_a", "suppkey_b", "name_a", "name_b")
        .distinct()
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("bigint"))
        .filter(F.col("dist") <= 1)
    )


# Shared decimal-product fragment for deterministic revenue sums (used by the
# TPC-H SQL below and the oracle table at the bottom of the module; the FLOOR
# recipe itself lives in _util.sql_dsum_prod so a precision fix lands once).
_DISC_PRICE_EXPR = (
    "CAST(l_extendedprice AS DECIMAL(18,4))"
    " * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"
)


_SQL_Q5 = f"""
SELECT n_name, {sql_dsum_prod(_DISC_PRICE_EXPR, 'revenue')}
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP_NTZ '1997-01-01 00:00:00'
GROUP BY n_name ORDER BY revenue DESC, n_name
"""


def sql_entry_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): the canonical snowflake 6-way join
    with a NON-join-key equality (``c_nationkey = s_nationkey``) riding on
    the lineitem-supplier join. Catalyst broadcasts the three dims
    (region→nation→supplier collapse into one broadcast chain below the
    AQE threshold) and the year filter prunes orders at the scan, so the
    only big shuffle pair is orders⋈lineitem on orderkey. At 100 TB the
    shape holds: dims stay broadcast-size, facts shuffle once each."""
    for name in ("customer", "orders", "lineitem", "supplier", "nation", "region"):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_SQL_Q5)


_SQL_Q6 = f"""
SELECT {sql_dsum_prod(
    "CAST(l_extendedprice AS DECIMAL(18,4))"
    " * CAST(l_discount AS DECIMAL(18,4))", 'revenue')},
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP_NTZ '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def sql_entry_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the canonical predicate-
    pushdown benchmark — a single scan whose three conjuncts (date range,
    discount band, quantity cap) must ALL reach the parquet reader so row
    groups skip on min/max stats before any row is materialized, followed
    by a scalar aggregate whose shuffle carries one partial per task. The
    discount band compares stored doubles to the same double literals in
    both engines, so the row set is bit-identical; the revenue product is
    the exact-decimal FLOOR recipe."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_SQL_Q6)


_SQL_Q8 = f"""
WITH vol AS (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
         n2.n_name AS supp_nation,
         {_DISC_PRICE_EXPR} AS volume
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'PROMO')
SELECT o_year,
       {sql_dsum_prod(
    "CASE WHEN supp_nation = 'NATION_2' THEN volume"
    " ELSE CAST(0 AS DECIMAL(18,4)) END", 'nation_volume')},
       {sql_dsum_prod('volume', 'total_volume')}
FROM vol GROUP BY o_year ORDER BY o_year
"""


def sql_entry_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share, adapted: no partsupp so the part
    filter is the PROMO type): the WIDEST join graph in the suite — seven
    tables, the nation dim joined twice (customer region gate vs supplier
    nationality), a region filter that prunes the customer side before the
    fact shuffles, and a per-year conditional-share aggregation. The
    market-share ratio is left to the consumer (or computed as in Q14)
    since both sums are FLOOR-exact and engine-identical."""
    for name in (
        "part", "lineitem", "orders", "customer", "nation", "region",
        "supplier",
    ):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_SQL_Q8)


_SQL_Q12 = """
SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS ship_year,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate
GROUP BY ship_year ORDER BY ship_year
"""


def sql_entry_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-priority audit, adapted: the testdata has
    no shipmode/commit/receipt dates, so the group key is the ship year and
    "late" is ``l_shipdate > o_orderdate``): one fact-fact join with a
    non-equi residual, then the canonical split conditional count (high vs
    low priority) per group. Integer CASE sums — no float anywhere."""
    for name in ("orders", "lineitem"):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_SQL_Q12)


_SQL_Q7 = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
       {sql_dsum_prod(_DISC_PRICE_EXPR, 'revenue')}, COUNT(*) AS n_lines
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (   (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_3'))
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def sql_entry_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): the same dimension table joined TWICE
    under different aliases (supplier nation vs customer nation) with a
    disjunction ACROSS the two join branches. The per-alias ``n_name``
    IsNotNull conjuncts push to each broadcast build side, but the cross-
    branch OR can only evaluate after both joins — exactly the plan a
    100 TB run wants, since each nation broadcast filters its fact side
    before the orderkey shuffle. Year extraction groups the exact decimal
    revenue per (supp, cust, year)."""
    for name in ("supplier", "lineitem", "orders", "customer", "nation"):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_SQL_Q7)


_SQL_Q10 = f"""
SELECT c_custkey, c_name, {sql_dsum_prod(_DISC_PRICE_EXPR, 'revenue')},
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP_NTZ '1996-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


def sql_entry_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): top-20 customers by revenue
    lost to returns in a half-year window. Both fact filters reach their
    scans (date range on orders, ``l_returnflag = 'R'`` on lineitem — a
    dictionary-encoded parquet column, so row groups skip wholesale), the
    nation dim broadcasts, and the top-20 is TakeOrderedAndProject over
    the per-customer aggregate — never a global sort. ``revenue DESC,
    c_custkey`` makes the limit deterministic."""
    for name in ("customer", "orders", "lineitem", "nation"):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_SQL_Q10)


_SQL_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT OUTER JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) c_orders
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


def sql_entry_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): a LEFT OUTER join
    whose filter lives in the JOIN CONDITION, not WHERE — pushing it to
    WHERE would change the semantics (customers with only urgent orders
    must still appear with count 0). Two cascaded aggregations: the first
    keyed on the (high-cardinality) custkey reuses the join's shuffle
    partitioning; the second groups ~50 distinct counts, so its exchange
    carries almost nothing. The count-of-counts histogram shape is the
    same plan ``llm_text_stats`` uses over documents."""
    for name in ("customer", "orders"):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_SQL_Q13)


_SQL_Q14 = f"""
SELECT promo_revenue, total_revenue,
       100.0 * promo_revenue / total_revenue AS promo_pct
FROM (
  SELECT {sql_dsum_prod(
      "CASE WHEN p_type = 'PROMO' THEN " + _DISC_PRICE_EXPR
      + " ELSE CAST(0 AS DECIMAL(18,4)) END", 'promo_revenue')},
         {sql_dsum_prod(_DISC_PRICE_EXPR, 'total_revenue')}
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE l_shipdate >= TIMESTAMP_NTZ '1996-03-01 00:00:00'
    AND l_shipdate <  TIMESTAMP_NTZ '1996-04-01 00:00:00'
) month_rev
"""


def sql_entry_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): conditional aggregation — one scan,
    two sums split by a dimension attribute, then their ratio. The month
    filter prunes lineitem before the part join (broadcast at any scale:
    part is the small side after column pruning to partkey+type). The
    percentage divides the two FLOOR-exact sums in one IEEE multiply and
    one divide, so it is bit-identical across engines — a raw double
    SUM ratio would be summation-order-dependent."""
    for name in ("lineitem", "part"):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_SQL_Q14)


_SQL_Q15 = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {sql_dsum_prod(_DISC_PRICE_EXPR, 'total_revenue')}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP_NTZ '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def sql_entry_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): a named CTE consumed TWICE — once as the
    join input, once inside an uncorrelated scalar subquery (the max).
    Spark evaluates the scalar subquery as its own job and injects the
    result as a literal filter, so the main plan stays one agg + one
    broadcast join; the equality filter on ``total_revenue`` is exact
    because the per-supplier revenue is the FLOOR-exact decimal sum
    (a double sum here could make max-ties engine-dependent)."""
    for name in ("lineitem", "supplier"):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_SQL_Q15)


_SQL_Q19 = f"""
SELECT {sql_dsum_prod(_DISC_PRICE_EXPR, 'revenue')}, COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 40)
"""


def sql_entry_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, adapted: the testdata part has
    no container/shipmode so the disjuncts pair brand+size with quantity
    bands): an OR-of-ANDs spanning BOTH join sides. Catalyst extracts the
    common equi-key (the disjunction never degrades to a nested loop) and
    derives per-side implied filters (brand IN (...), size ≤ 35 to the
    part scan; quantity ≤ 40 to lineitem) so each scan prunes before the
    join — the classic disjunctive-pushdown test."""
    for name in ("lineitem", "part"):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_SQL_Q19)


_SQL_Q22 = """
SELECT cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
FROM (
  SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode, c_acctbal
  FROM customer
  WHERE c_nationkey IN (0, 1, 2, 3, 4, 5, 6)
    AND c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,4)))
                                 AS DOUBLE) / COUNT(*)
                     FROM customer c2
                     WHERE c2.c_acctbal > 0
                       AND c2.c_nationkey IN (0, 1, 2, 3, 4, 5, 6))
    AND NOT EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
) prospective
GROUP BY cntrycode ORDER BY cntrycode
"""


def sql_entry_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity, adapted: the testdata
    customer has no phone so country code is ``c_nationkey % 5`` and the
    no-orders test is "never placed an URGENT order"): an uncorrelated
    scalar AVG subquery (evaluated once, injected as a literal) plus a
    correlated NOT EXISTS that Catalyst decorrelates to a LEFT ANTI join
    on custkey. The average threshold is deterministic because it divides
    the exact decimal sum by the count — a plain AVG(double) would be
    partition-order-dependent and could flip boundary customers."""
    for name in ("customer", "orders"):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_SQL_Q22)


def sql_entry_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (``spark.sql(query, args=...)``): named markers
    bound server-side — the injection-safe templating surface an external
    driver should use instead of string interpolation. The parameters land
    as literals in the plan, so constant folding and scan pushdown see
    them exactly like inline values (the oracle inlines the same
    constants)."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS total_price
        FROM orders
        WHERE o_orderstatus = :status AND o_totalprice > :floor
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        args={"status": "F", "floor": 1000.0},
    )


_SQL_SCRIPTING = """
BEGIN
  DECLARE threshold BIGINT DEFAULT 1;
  DECLARE half BIGINT;
  DECLARE below BIGINT DEFAULT 0;
  SET half = (SELECT COUNT(*) DIV 2 FROM orders);
  WHILE below < half DO
    SET threshold = threshold * 2;
    SET below = (SELECT COUNT(*) FROM orders WHERE o_totalprice < threshold);
  END WHILE;
  SELECT threshold, below AS n_below, half;
END
"""


def sql_entry_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (new in Spark 4): a BEGIN…END block with DECLAREd
    variables and a WHILE loop, each iteration a full distributed query —
    finds the smallest power-of-two price threshold covering half the
    orders (a driver-side control-flow + cluster-side query pattern that
    previously needed Python glue). Integer-only state (BIGINT counts,
    DIV) so the loop exit is bit-deterministic; the oracle enumerates the
    same powers of two declaratively. Bounded: ≤ ~40 iterations for any
    price magnitude, each a scan-pushable count. The scripting conf is a
    session convention pinned by ``session.prepare`` (via ``table``), so
    this entry leaks no conf change into the shared session."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SQL_SCRIPTING)


# ---------------------------------------------------------------------------
# Derived partsupp: the five partsupp-dependent TPC-H queries (22/22)
# ---------------------------------------------------------------------------

# The driver's testdata ships no partsupp table, so the five TPC-H queries
# that need one (Q2/Q9/Q11/Q16/Q20) derive it DETERMINISTICALLY from the
# existing keys, with dbgen's shape: each part gets exactly 4 distinct
# suppliers striped across the supplier space (offsets i*floor(S/4), i<4 —
# all distinct mod S for S≥4), availqty in 1..9999 and supplycost in
# 1.00..1000.00 as pure integer functions of (partkey, suppkey, stripe).
# Every expression is integer arithmetic (+ one exact int→double divide by
# 100), so Spark and DuckDB evaluate the SAME SQL text to bit-identical
# rows: Spark registers it as the ``partsupp`` temp view, the oracle
# carries it as a ``WITH partsupp AS (…)`` prefix over the same parquet.
#
# Plan shape: part CROSS JOIN a 1-row supplier-count aggregate CROSS JOIN a
# 4-row stripe spine — both broadcast nested-loop joins with scale-
# INDEPENDENT build sides (1 and 4 rows), so the derivation is a linear,
# shuffle-free map over part at any scale (justified in
# tests/test_plan_lint.py::BNLJ_BOUNDED).
_PARTSUPP_BODY = """
SELECT ps_partkey, ps_suppkey,
       (ps_partkey * 7 + ps_suppkey * 3 + ps_seq) % 9999 + 1 AS ps_availqty,
       CAST((ps_partkey * 31 + ps_suppkey * 17 + ps_seq * 5) % 99900 + 100
            AS DOUBLE) / 100 AS ps_supplycost
FROM (
  SELECT p_partkey AS ps_partkey,
         (p_partkey + quad.i * CAST(FLOOR(s_cnt / 4.0) AS BIGINT)) % s_cnt
           AS ps_suppkey,
         quad.i AS ps_seq
  FROM part
  CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS s_cnt FROM supplier) sc
  CROSS JOIN (VALUES (0), (1), (2), (3)) AS quad(i)
) ps0
"""


def _partsupp_views(spark: SparkSession, sf_dir: str, *extra: str) -> None:
    """Register ``partsupp`` (plus its part/supplier inputs and ``extra``
    base tables) as temp views for a partsupp-dependent SQL entry."""
    for name in ("part", "supplier", *extra):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    spark.sql("CREATE OR REPLACE TEMP VIEW partsupp AS " + _PARTSUPP_BODY)


def _partsupp_oracle(query_sql: str) -> str:
    """DuckDB oracle: the same query text over a partsupp CTE."""
    return (
        "WITH partsupp AS (" + _PARTSUPP_BODY + ")\n"
        + query_sql.replace("TIMESTAMP_NTZ", "TIMESTAMP")
    )


_SQL_Q2 = """
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost
FROM part
JOIN partsupp ON p_partkey = ps_partkey
JOIN supplier ON s_suppkey = ps_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_size = 15 AND r_name = 'EUROPE'
  AND ps_supplycost = (SELECT MIN(ps_supplycost)
                       FROM partsupp, supplier, nation, region
                       WHERE ps_partkey = p_partkey
                         AND s_suppkey = ps_suppkey
                         AND s_nationkey = n_nationkey
                         AND n_regionkey = r_regionkey
                         AND r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
"""


def sql_entry_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier, adapted: no p_mfgr/comment columns
    so the part gate is ``p_size = 15``): a correlated scalar MIN subquery
    over the SAME join graph as the outer query. Catalyst decorrelates it
    into a per-part min-cost aggregate joined back on ``p_partkey`` — the
    region-filtered partsupp side is computed once, never per outer row.
    The derived partsupp is a broadcast-crossed linear map over part (see
    ``_PARTSUPP_BODY``), so at 100 TB the whole plan is two passes over
    the part-scaled derivation plus broadcast dims. ``s_acctbal DESC,
    n_name, s_name, p_partkey`` makes the LIMIT deterministic (s_name is
    unique per supplier; p_partkey breaks multi-part ties)."""
    _partsupp_views(spark, sf_dir, "nation", "region")
    return spark.sql(_SQL_Q2)


_Q9_AMOUNT = (
    "CAST(l_extendedprice AS DECIMAL(18,4))"
    " * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"
    " - CAST(ps_supplycost AS DECIMAL(18,4))"
    " * CAST(l_quantity AS DECIMAL(18,4))"
)

_SQL_Q9 = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
       {sql_dsum_prod(_Q9_AMOUNT, 'sum_profit')}
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
"""


def sql_entry_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit): the one join shape nothing else in
    the suite exercises — a fact joined through a DERIVED two-column-keyed
    dimension (``(ps_partkey, ps_suppkey)``) plus four more tables, with a
    profit expression mixing fact and dimension columns. The derived
    partsupp keeps dbgen's stripe structure, so only lineitems whose
    supplier is one of the part's 4 stripes match (a sparser join than
    dbgen's by construction — identically sparse in the oracle). The
    ``%red%`` name filter pushes to the part scan and AQE sizes the
    partsupp side at runtime; profit uses the exact-decimal FLOOR recipe
    so per-(nation, year) sums are bit-identical across engines."""
    _partsupp_views(spark, sf_dir, "lineitem", "orders", "nation")
    return spark.sql(_SQL_Q9)


_Q11_VALUE = "CAST(ps_supplycost AS DECIMAL(18,4)) * ps_availqty"

_SQL_Q11 = f"""
SELECT ps_partkey, {sql_dsum_prod(_Q11_VALUE, 'value')}
FROM partsupp
JOIN supplier ON ps_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY ps_partkey
HAVING SUM({_Q11_VALUE}) >
       (SELECT SUM({_Q11_VALUE}) * 0.0005
        FROM partsupp, supplier, nation, region
        WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_regionkey = r_regionkey AND r_name = 'ASIA')
ORDER BY value DESC, ps_partkey
"""


def sql_entry_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock, adapted: the gate is a region rather
    than dbgen's single nation so every scale factor keeps a non-empty
    supplier side): a grouped aggregate HAVING-compared against an
    UNCORRELATED scalar subquery over the same join — Catalyst computes
    the total once (one extra aggregate, broadcast as a literal join), not
    per group. Both sides sum the identical exact-decimal product, and the
    0.0005 fraction multiplies the exact total in IEEE double on both
    engines, so the group survivor set is bit-deterministic."""
    _partsupp_views(spark, sf_dir, "nation", "region")
    return spark.sql(_SQL_Q11)


_SQL_Q16 = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
FROM partsupp
JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#13' AND p_type <> 'ECONOMY'
  AND p_size IN (5, 11, 17, 23, 29, 35, 41, 47)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                         WHERE s_acctbal < 500.0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def sql_entry_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship, adapted: the excluded-
    supplier gate is ``s_acctbal < 500`` since the testdata has no comment
    column): NOT IN over a nullable-free key column plans as a null-aware
    anti join against the (tiny, broadcast) bad-supplier list, then a
    COUNT(DISTINCT) per (brand, type, size) — Spark expands the distinct
    into a two-phase aggregate, so the shuffle carries (group, suppkey)
    pairs once each, never raw partsupp rows twice."""
    _partsupp_views(spark, sf_dir)
    return spark.sql(_SQL_Q16)


_SQL_Q20 = """
SELECT s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_regionkey = 2
  AND s_suppkey IN (
    SELECT ps_suppkey FROM partsupp
    WHERE ps_partkey IN (SELECT p_partkey FROM part
                         WHERE p_name LIKE 'small%')
      AND ps_availqty > (SELECT 0.5 * SUM(l_quantity) FROM lineitem
                         WHERE l_partkey = ps_partkey
                           AND l_suppkey = ps_suppkey
                           AND l_shipdate >=
                               TIMESTAMP_NTZ '1996-01-01 00:00:00'
                           AND l_shipdate <
                               TIMESTAMP_NTZ '1997-01-01 00:00:00'))
ORDER BY s_name
"""


def sql_entry_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion, adapted: the supplier gate is
    the ASIA region — ``n_regionkey = 2`` — so every scale factor keeps
    a non-empty supplier pool): THREE nesting levels — an IN over
    partsupp, itself filtered by an IN over part and by a scalar aggregate
    correlated on BOTH join columns (``(ps_partkey, ps_suppkey)``).
    Catalyst decorrelates the inner sum into a grouped aggregate over the
    date-filtered lineitem joined back on the pair key, and the outer INs
    become semi joins — zero per-row subquery execution. Pairs with no
    1996 shipments compare NULL and drop, identically in both engines;
    the half-shipped-quantity threshold is an exact small-integer sum in
    doubles."""
    _partsupp_views(spark, sf_dir, "nation", "lineitem")
    return spark.sql(_SQL_Q20)


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

QUERIES = {
    "scan_parquet": scan_parquet,
    "sink_parquet_roundtrip": sink_parquet_roundtrip,
    "project_rename": project_rename,
    "filter_pred": filter_pred,
    "filter_null_norm": filter_null_norm,
    "project_case": project_case,
    "project_cast_arith": project_cast_arith,
    "join_inner_equi": join_inner_equi,
    "join_broadcast": join_broadcast,
    "join_left_outer": join_left_outer,
    "join_full_outer": join_full_outer,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_theta_range": join_theta_range,
    "join_multiway": join_multiway,
    "join_asof_event": join_asof_event,
    "join_interval_overlap": join_interval_overlap,
    "join_bloom_prefilter": join_bloom_prefilter,
    "join_dpp_partitioned": join_dpp_partitioned,
    "agg_count_star": agg_count_star,
    "agg_groupby_label": agg_groupby_label,
    "agg_distinct": agg_distinct,
    "agg_approx_distinct": agg_approx_distinct,
    "agg_grouping_sets": agg_grouping_sets,
    "agg_having": agg_having,
    "agg_stats": agg_stats,
    "win_rank": win_rank,
    "win_running_sum": win_running_sum,
    "win_lag_lead": win_lag_lead,
    "win_topk_per_group": win_topk_per_group,
    "sort_limit": sort_limit,
    "set_union_all": set_union_all,
    "set_intersect": set_intersect,
    "set_except": set_except,
    "sql_entry_tpch_q3": sql_entry_tpch_q3,
    "sql_entry_tpch_q1": sql_entry_tpch_q1,
    "filter_in_subquery": filter_in_subquery,
    "sql_entry_tpch_q4": sql_entry_tpch_q4,
    "sql_entry_tpch_q17": sql_entry_tpch_q17,
    "sql_entry_tpch_q18": sql_entry_tpch_q18,
    "sql_entry_tpch_q21": sql_entry_tpch_q21,
    "sql_entry_recursive_cte": sql_entry_recursive_cte,
    "sql_entry_tpch_q5": sql_entry_tpch_q5,
    "sql_entry_tpch_q7": sql_entry_tpch_q7,
    "sql_entry_tpch_q10": sql_entry_tpch_q10,
    "sql_entry_tpch_q13": sql_entry_tpch_q13,
    "sql_entry_tpch_q14": sql_entry_tpch_q14,
    "sql_entry_tpch_q15": sql_entry_tpch_q15,
    "sql_entry_tpch_q19": sql_entry_tpch_q19,
    "sql_entry_tpch_q22": sql_entry_tpch_q22,
    "join_bucketed_colocated": join_bucketed_colocated,
    "join_edit_distance": join_edit_distance,
    "sql_entry_tpch_q6": sql_entry_tpch_q6,
    "sql_entry_tpch_q8": sql_entry_tpch_q8,
    "sql_entry_tpch_q12": sql_entry_tpch_q12,
    "sql_entry_scripting": sql_entry_scripting,
    "sql_entry_parameterized": sql_entry_parameterized,
    "sql_entry_tpch_q2": sql_entry_tpch_q2,
    "sql_entry_tpch_q9": sql_entry_tpch_q9,
    "sql_entry_tpch_q11": sql_entry_tpch_q11,
    "sql_entry_tpch_q16": sql_entry_tpch_q16,
    "sql_entry_tpch_q20": sql_entry_tpch_q20,
}

# DuckDB oracles for the subquery-decorrelation suite: identical SQL modulo
# the timestamp-literal keyword (Spark TIMESTAMP_NTZ vs DuckDB TIMESTAMP).
_ORACLE_Q4 = _SQL_Q4.replace("TIMESTAMP_NTZ", "TIMESTAMP")

ORACLES = {
    "sql_entry_tpch_q1": (
        "SELECT l_returnflag, l_linestatus,"
        " CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,"
        " CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)"
        "   AS sum_base_price,"
        " CAST(CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,4))"
        "          * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))"
        "      * 10000) AS BIGINT) AS DOUBLE) / 10000 AS sum_disc_price,"
        " CAST(CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,4))"
        "          * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))"
        "          * (CAST(1 AS DECIMAL(8,4)) + CAST(l_tax AS DECIMAL(8,4))))"
        "      * 10000) AS BIGINT) AS DOUBLE) / 10000 AS sum_charge,"
        " ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)"
        "       / COUNT(*), 4) AS avg_qty,"
        " ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)"
        "       / COUNT(*), 4) AS avg_disc,"
        " COUNT(*) AS count_order"
        " FROM lineitem"
        " WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'"
        " GROUP BY l_returnflag, l_linestatus"
        " ORDER BY l_returnflag, l_linestatus"
    ),
    "scan_parquet": "SELECT * FROM supplier",
    "sink_parquet_roundtrip": "SELECT * FROM nation",
    "project_rename": (
        "SELECT c_custkey AS c_custkey, c_name AS c_name,"
        " c_mktsegment AS c_mkt_segment FROM customer"
    ),
    "filter_pred": (
        "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders"
        " WHERE o_orderstatus = 'F' AND o_totalprice < 150000.0"
        " AND o_orderpriority IN ('1-URGENT', '2-HIGH')"
        " AND o_orderpriority LIKE '%H%' AND o_orderstatus IS NOT NULL"
    ),
    "filter_null_norm": (
        "SELECT event_id, NULLIF(event_type, '') AS event_type, user_id"
        " FROM events WHERE NULLIF(event_type, '') IS NOT NULL"
    ),
    "project_case": (
        "SELECT c_custkey,"
        " CASE WHEN c_acctbal < 0 THEN 'debtor'"
        "      WHEN c_acctbal < 5000 THEN"
        "        (CASE WHEN c_mktsegment = 'BUILDING' THEN 'building-small'"
        "              ELSE 'small' END)"
        "      ELSE 'large' END AS tier,"
        " CASE WHEN c_acctbal > 9000 THEN 'vip' END AS vip_flag"
        " FROM customer"
    ),
    "project_cast_arith": (
        "SELECT l_orderkey, l_linenumber, CAST(l_quantity AS INTEGER) AS qty_int,"
        " CAST(CAST(l_extendedprice AS DECIMAL(18,4))"
        "      * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"
        "      AS DOUBLE) AS disc_price,"
        " CAST(CAST(l_extendedprice AS DECIMAL(18,4))"
        "      * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"
        "      * (CAST(1 AS DECIMAL(18,4)) + CAST(l_tax AS DECIMAL(18,4)))"
        "      AS DOUBLE) AS charge"
        " FROM lineitem"
    ),
    "join_inner_equi": (
        "SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice"
        " FROM orders JOIN customer ON o_custkey = c_custkey"
    ),
    "join_broadcast": (
        "SELECT l_orderkey, l_linenumber, p_brand, p_type, l_quantity"
        " FROM lineitem JOIN part ON l_partkey = p_partkey"
    ),
    "join_left_outer": (
        "SELECT c_custkey, c_name, o_orderkey, o_orderstatus"
        " FROM customer LEFT JOIN orders ON c_custkey = o_custkey"
    ),
    "join_full_outer": (
        "SELECT n_nationkey, n_name, s_suppkey, s_name"
        " FROM nation FULL OUTER JOIN supplier ON n_nationkey = s_nationkey"
    ),
    "join_semi": (
        "SELECT c_custkey, c_name FROM customer c"
        " WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"
    ),
    "join_anti": (
        "SELECT c_custkey, c_name, c_acctbal FROM customer c"
        " WHERE NOT EXISTS (SELECT 1 FROM orders o"
        " WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)"
    ),
    "join_theta_range": (
        "SELECT p1.p_partkey AS partkey_a, p2.p_partkey AS partkey_b,"
        " p1.p_brand AS p_brand"
        " FROM part p1 JOIN part p2 ON p1.p_brand = p2.p_brand"
        " AND p1.p_partkey < p2.p_partkey"
        " AND ABS(CAST(p1.p_retailprice AS DECIMAL(18,4))"
        "         - CAST(p2.p_retailprice AS DECIMAL(18,4)))"
        "     <= CAST(5.0 AS DECIMAL(18,4))"
    ),
    "join_multiway": (
        "SELECT r_name,"
        f" {sql_dsum_prod(_DISC_PRICE_EXPR, 'revenue')},"
        " COUNT(*) AS n_items"
        " FROM lineitem"
        " JOIN orders ON l_orderkey = o_orderkey"
        " JOIN customer ON o_custkey = c_custkey"
        " JOIN nation ON c_nationkey = n_nationkey"
        " JOIN region ON n_regionkey = r_regionkey"
        " GROUP BY r_name"
    ),
    "join_asof_event": (
        "WITH u AS ("
        "  SELECT o_orderkey, o_custkey AS uid, o_orderdate AS ts,"
        "         CAST(NULL AS BIGINT) AS ev_id, 1 AS is_order FROM orders"
        "  UNION ALL"
        "  SELECT CAST(NULL AS BIGINT), user_id, CAST(ts AS TIMESTAMP),"
        "         event_id, 0 FROM events"
        "), w AS ("
        "  SELECT *, LAST_VALUE(CASE WHEN is_order = 0 THEN ev_id END IGNORE NULLS)"
        "    OVER (PARTITION BY uid ORDER BY ts, is_order, ev_id"
        "          ROWS UNBOUNDED PRECEDING) AS last_event_id"
        "  FROM u)"
        " SELECT o_orderkey, uid AS o_custkey, ts AS o_orderdate, last_event_id"
        " FROM w WHERE is_order = 1"
    ),
    # The oracle is the direct (unbanded) overlap self-join — same pairs,
    # found by DuckDB's inequality join instead of the calendar-grid cells.
    "join_interval_overlap": (
        "WITH iv AS (SELECT o_orderkey, o_custkey,"
        "  CAST(o_orderdate AS DATE) AS s,"
        "  CAST(o_orderdate AS DATE) + INTERVAL (3 + o_orderkey % 11) DAY AS e"
        " FROM orders)"
        " SELECT a.o_custkey AS custkey, a.o_orderkey AS a_orderkey,"
        "  b.o_orderkey AS b_orderkey,"
        "  CAST(DATEDIFF('day', GREATEST(a.s, b.s), LEAST(a.e, b.e)) + 1"
        "       AS INTEGER) AS overlap_days"
        " FROM iv a JOIN iv b ON a.o_custkey = b.o_custkey"
        "  AND a.o_orderkey < b.o_orderkey"
        "  AND a.s <= b.e AND b.s <= a.e"
    ),
    # Oracle is the PLAIN join — the Bloom prefilter is a conservative
    # reduction (no false negatives), so the exact join after it returns
    # byte-identical results.
    "join_bloom_prefilter": (
        "SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,"
        f" {sql_dsum('l_quantity', 'sum_qty')},"
        f" {sql_dsum_prod(_DISC_PRICE_EXPR, 'revenue')}"
        " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
        " WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 300000"
        " GROUP BY l_returnflag, l_linestatus"
    ),
    # Pruning is semantics-preserving: the oracle is the plain year-join
    # against the same literal dimension.
    "join_dpp_partitioned": (
        "SELECT o_orderpriority, COUNT(*) AS n_orders,"
        f" {sql_dsum('o_totalprice', 'sum_price')}"
        " FROM orders"
        " JOIN (VALUES (1995,'historical'),(1996,'historical'),"
        "  (1997,'current'),(1998,'historical'),(1999,'historical'),"
        "  (2000,'historical'),(2001,'historical')) AS d(d_year, era)"
        " ON year(o_orderdate) = d_year"
        " WHERE era = 'current'"
        " GROUP BY o_orderpriority"
    ),
    "agg_count_star": "SELECT COUNT(*) AS cnt FROM lineitem",
    "agg_groupby_label": (
        "SELECT l_returnflag, l_linestatus,"
        f" {sql_dsum('l_quantity', 'sum_qty')},"
        f" {sql_dsum('l_extendedprice', 'sum_base_price')},"
        f" {sql_dsum_prod(_DISC_PRICE_EXPR, 'sum_disc_price')},"
        f" {sql_davg('l_quantity', 'avg_qty')},"
        f" {sql_davg('l_extendedprice', 'avg_price')},"
        " COUNT(*) AS count_order"
        " FROM lineitem GROUP BY l_returnflag, l_linestatus"
    ),
    "agg_distinct": (
        "SELECT COUNT(DISTINCT l_partkey) AS d_part,"
        " COUNT(DISTINCT l_suppkey) AS d_supp, COUNT(*) AS cnt FROM lineitem"
    ),
    "agg_grouping_sets": (
        "SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,"
        f" {sql_dsum('l_quantity', 'sum_qty')}"
        " FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"
    ),
    "agg_having": (
        "SELECT o_custkey, COUNT(*) AS order_cnt,"
        f" {sql_dsum('o_totalprice', 'total_spend')}"
        " FROM orders GROUP BY o_custkey HAVING COUNT(*) > 5"
    ),
    "agg_stats": (
        "WITH s AS (SELECT"
        "  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))"
        "           * CAST(1 AS DECIMAL(18,4))) AS DOUBLE) AS sum_x,"
        "  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))"
        "           * CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_x2,"
        "  CAST(COUNT(p_retailprice) AS DOUBLE) AS n,"
        "  quantile_cont(p_retailprice, 0.5) AS med"
        " FROM part)"
        " SELECT ROUND((sum_x2 - sum_x * sum_x / n) / (n - 1.0), 4) AS var_price,"
        " ROUND(SQRT((sum_x2 - sum_x * sum_x / n) / (n - 1.0)), 4) AS stddev_price,"
        " ROUND(med, 4) AS median_price, CAST(n AS BIGINT) AS n FROM s"
    ),
    "win_rank": (
        "SELECT o_orderkey, o_custkey, o_totalprice,"
        " RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk,"
        " ROW_NUMBER() OVER w AS rn FROM orders"
        " WINDOW w AS (PARTITION BY o_custkey"
        "              ORDER BY o_totalprice DESC, o_orderkey)"
    ),
    "win_running_sum": (
        "SELECT o_orderkey, o_custkey, o_orderdate,"
        " CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))"
        "      OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"
        "            ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend"
        " FROM orders"
    ),
    "win_lag_lead": (
        "SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,"
        " epoch_us(CAST(ts AS TIMESTAMP))"
        "   - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS gap_us,"
        " LEAD(epoch_us(CAST(ts AS TIMESTAMP))) OVER w"
        "   - epoch_us(CAST(ts AS TIMESTAMP)) AS lead_us"
        " FROM events WINDOW w AS (PARTITION BY user_id"
        " ORDER BY CAST(ts AS TIMESTAMP), event_id)"
    ),
    "win_topk_per_group": (
        "SELECT o_custkey, o_orderkey, o_totalprice, rn FROM ("
        "  SELECT o_custkey, o_orderkey, o_totalprice,"
        "  ROW_NUMBER() OVER (PARTITION BY o_custkey"
        "                     ORDER BY o_totalprice DESC, o_orderkey) AS rn"
        "  FROM orders) WHERE rn <= 3"
    ),
    "sort_limit": (
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders"
        " ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
    ),
    "set_union_all": (
        "SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 8000"
        " UNION ALL"
        " SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'"
    ),
    "set_intersect": (
        "SELECT c_custkey AS custkey FROM customer"
        " INTERSECT SELECT o_custkey AS custkey FROM orders"
    ),
    "set_except": (
        "SELECT c_custkey AS custkey FROM customer"
        " EXCEPT SELECT o_custkey AS custkey FROM orders"
        " WHERE o_orderpriority = '1-URGENT'"
    ),
    "filter_in_subquery": (
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders"
        " WHERE o_custkey IN (SELECT c_custkey FROM customer"
        "                     WHERE c_acctbal > 5000)"
        " AND o_orderkey NOT IN (SELECT o_orderkey FROM orders"
        "                        WHERE o_orderpriority = '1-URGENT')"
    ),
    "sql_entry_tpch_q3": (
        "SELECT l_orderkey,"
        f" {sql_dsum_prod(_DISC_PRICE_EXPR, 'revenue')},"
        " o_orderdate, o_orderpriority"
        " FROM customer"
        " JOIN orders ON c_custkey = o_custkey"
        " JOIN lineitem ON l_orderkey = o_orderkey"
        " WHERE c_mktsegment = 'BUILDING' AND l_shipdate > o_orderdate"
        " GROUP BY l_orderkey, o_orderdate, o_orderpriority"
        " ORDER BY revenue DESC, l_orderkey LIMIT 20"
    ),
    "sql_entry_tpch_q4": _ORACLE_Q4,
    "sql_entry_tpch_q17": _SQL_Q17,
    "sql_entry_tpch_q18": _SQL_Q18,
    "sql_entry_tpch_q21": _SQL_Q21,
    "sql_entry_recursive_cte": _SQL_RCTE,
    # Q5/Q7/Q10/Q13/Q14/Q15/Q19/Q22: identical SQL modulo the Spark-only
    # TIMESTAMP_NTZ literal keyword (same convention as _ORACLE_Q4).
    "sql_entry_tpch_q5": _SQL_Q5.replace("TIMESTAMP_NTZ", "TIMESTAMP"),
    "sql_entry_tpch_q7": _SQL_Q7,
    "sql_entry_tpch_q10": _SQL_Q10.replace("TIMESTAMP_NTZ", "TIMESTAMP"),
    "sql_entry_tpch_q13": _SQL_Q13,
    "sql_entry_tpch_q14": _SQL_Q14.replace("TIMESTAMP_NTZ", "TIMESTAMP"),
    "sql_entry_tpch_q15": _SQL_Q15.replace("TIMESTAMP_NTZ", "TIMESTAMP"),
    "sql_entry_tpch_q19": _SQL_Q19,
    "sql_entry_tpch_q22": _SQL_Q22,
    "sql_entry_tpch_q6": _SQL_Q6.replace("TIMESTAMP_NTZ", "TIMESTAMP"),
    "sql_entry_tpch_q8": _SQL_Q8,
    "sql_entry_tpch_q12": _SQL_Q12,
    # Same query with the parameters inlined.
    "sql_entry_parameterized": (
        "SELECT o_orderpriority, COUNT(*) AS n_orders,"
        " CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)"
        "   AS total_price"
        " FROM orders"
        " WHERE o_orderstatus = 'F' AND o_totalprice > 1000.0"
        " GROUP BY o_orderpriority ORDER BY o_orderpriority"
    ),
    # Declarative twin of the scripting loop: enumerate the powers of two
    # and take the first whose below-count reaches half.
    "sql_entry_scripting": (
        "WITH n AS (SELECT COUNT(*) // 2 AS half FROM orders),"
        # the 2^0 row exists ONLY for the empty-table edge (half = 0 -> the
        # script's WHILE never runs and returns threshold = 1); for half > 0
        # the script doubles BEFORE counting so 1 is unreachable — gate it
        " ps AS (SELECT CAST(POW(2, g) AS BIGINT) AS p"
        "        FROM generate_series(0, 40) t(g)"
        "        WHERE g > 0 OR (SELECT half FROM n) = 0),"
        " c AS (SELECT p, (SELECT COUNT(*) FROM orders"
        "                  WHERE o_totalprice < p) AS below FROM ps)"
        " SELECT p AS threshold, below AS n_below,"
        " (SELECT half FROM n) AS half"
        " FROM c WHERE below >= (SELECT half FROM n)"
        " ORDER BY p LIMIT 1"
    ),
    # Brute-force all-pairs reference: proves the deletion-neighborhood
    # banding loses no pair.
    "join_edit_distance": (
        "SELECT a.s_suppkey AS suppkey_a, b.s_suppkey AS suppkey_b,"
        " a.s_name AS name_a, b.s_name AS name_b,"
        " CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS dist"
        " FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey"
        " WHERE levenshtein(a.s_name, b.s_name) <= 1"
    ),
    # Bucketing changes the physical layout, never the result: the oracle is
    # the plain join+agg on the raw views.
    "join_bucketed_colocated": (
        "SELECT o_orderstatus, COUNT(*) AS n_lines,"
        f" {sql_dsum('l_quantity', 'sum_qty')},"
        f" {sql_dsum_prod(_DISC_PRICE_EXPR, 'revenue')}"
        " FROM orders JOIN lineitem ON o_orderkey = l_orderkey"
        " GROUP BY o_orderstatus ORDER BY o_orderstatus"
    ),
    # partsupp-dependent TPC-H: the SAME query text over a partsupp CTE
    # (DuckDB evaluates the identical integer derivation — see
    # _PARTSUPP_BODY — so the rows are bit-identical by construction).
    "sql_entry_tpch_q2": _partsupp_oracle(_SQL_Q2),
    "sql_entry_tpch_q9": _partsupp_oracle(_SQL_Q9),
    "sql_entry_tpch_q11": _partsupp_oracle(_SQL_Q11),
    "sql_entry_tpch_q16": _partsupp_oracle(_SQL_Q16),
    "sql_entry_tpch_q20": _partsupp_oracle(_SQL_Q20),
}
