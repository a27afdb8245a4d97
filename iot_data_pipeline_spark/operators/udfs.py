"""UDF surface (SURVEY.md §2B "UDF surface").

Demonstrates every Python-execution tier Spark offers, cheapest first:

1. ``udf_scalar`` — row-at-a-time Python UDF. The SLOW path (pickle per row,
   Python round-trip); present for parity with the reference's imperative
   logic and cross-checked against the pure-expression version.
2. ``udf_pandas_scalar`` — Arrow-batched pandas UDF (Series→Series): the
   correct way to run Python at scale, ~10-100× the row UDF.
3. ``udf_grouped_map`` — ``applyInPandas`` per-group transform.
4. ``udaf_pandas`` — grouped-agg pandas UDF (custom aggregate).
5. ``udtf_explode`` — 1→N expansion via built-in ``explode`` (generator-style
   UDTF semantics without leaving the JVM).
6. ``udf_arrow_map`` — mapInArrow: RecordBatch-level Python, no pandas
   materialization — the lowest-overhead Python tier of all.
7. ``udtf_python_lateral`` — a real Spark 4 ``@udtf`` class applied per row
   via LATERAL with multi-column generator output.
"""

from __future__ import annotations

import math
import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from iot_data_pipeline_spark.functions.scalar_suites import (
    DURATION_ORACLE_SQL,
    _duration_fixture_df,
)
from iot_data_pipeline_spark.operators._util import table
from iot_data_pipeline_spark.session import prepare

_RE_DAYS = re.compile(r"(\d+)\s+days")
_RE_HH = re.compile(r"days\s+(\d{2}):")
_RE_MM = re.compile(r":(\d{2}):")
_RE_SS = re.compile(r":(\d{2})\.")
_RE_FRAC = re.compile(r"\.(\d+)")


def _duration_to_seconds_py(s: str | None) -> float | None:
    """Pure-Python replica of the reference duration parse (quirks 1-2),
    used by the scalar UDF. Mirrors functions.transforms.duration_to_seconds."""
    if s is None:
        return None
    parts = []
    for rx, scale in (
        (_RE_DAYS, 86400.0),
        (_RE_HH, 3600.0),
        (_RE_MM, 60.0),
        (_RE_SS, 1.0),
        (_RE_FRAC, 1e-6),
    ):
        m = rx.search(s)
        parts.append(float(m.group(1)) * scale if m else None)
    if all(p is not None for p in parts):
        return sum(parts)
    if "days" in s:
        return None
    try:
        return float(s)
    except ValueError:
        return None


def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF of the duration parse, verified against the
    same pinned golden values as the expression version (fn_regexp_extract)."""
    prepare(spark)
    dur_udf = F.udf(_duration_to_seconds_py, DoubleType())
    df = _duration_fixture_df(spark)
    return df.select(
        "id", F.round(dur_udf("duration"), 6).alias("duration_sec")
    )


def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched pandas UDF: L2 norm of each embedding. One Arrow batch
    in, one out — this is the pattern every multimodal/vector op uses."""
    prepare(spark)

    @F.pandas_udf("double")
    def l2_norm(vecs: pd.Series) -> pd.Series:
        return vecs.map(
            lambda v: math.sqrt(sum(float(x) * float(x) for x in v))
        )

    e = table(spark, sf_dir, "embeddings")
    return e.select("vec_id", F.round(l2_norm("embedding"), 4).alias("l2_norm"))


def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas per-group z-score of customer balances by nation.
    One shuffle on the group key; each group is a pandas frame in an
    executor — the canonical custom-stateless-transform shape."""
    prepare(spark)
    c = table(spark, sf_dir, "customer")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["c_acctbal"].mean()
        sd = pdf["c_acctbal"].std(ddof=1)
        z = (pdf["c_acctbal"] - mu) / sd
        z = z.where(pd.notna(z) & (sd != 0), None)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_nationkey": pdf["c_nationkey"],
                "bal_z": z.round(4),
            }
        )

    return c.groupBy("c_nationkey").applyInPandas(
        zscore, "c_custkey LONG, c_nationkey INT, bal_z DOUBLE"
    )


def udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate (geometric mean of part prices per brand) as a
    grouped-agg pandas UDF — partial aggregation is handled by Spark; the
    Python side only sees final groups."""
    prepare(spark)

    @F.pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))

    # Spark disallows mixing grouped-agg pandas UDFs with JVM aggregates in
    # one agg(), so the row count is a second pandas aggregate.
    @F.pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    p = table(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.round(geo_mean("p_retailprice"), 4).alias("geo_price"),
        n_rows("p_retailprice").alias("n_parts"),
    )


def udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→N expansion: documents → words → corpus word frequencies. explode of
    a split stays JVM-side (generator semantics, no UDF tax)."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def udf_arrow_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the lowest-overhead Python tier — RecordBatch in,
    RecordBatch out, no pandas materialization. Computes embedding dims
    with pyarrow compute directly on the batch columns."""
    prepare(spark)
    import pyarrow as pa

    def batch_stats(batches):
        import pyarrow.compute as pc

        for batch in batches:
            dims = pc.list_value_length(batch.column("embedding")).cast(
                pa.int32()
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column("vec_id"), dims], names=["vec_id", "dim"]
            )

    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return e.mapInArrow(batch_stats, "vec_id LONG, dim INT")


def udtf_python_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL Python UDTF (Spark 4 ``@udtf``) applied per row via LATERAL:
    each document expands to (token position, token, length) rows. Unlike
    ``udtf_explode`` (JVM generator), this runs arbitrary Python per input
    row with multi-column output — the full table-function contract."""
    prepare(spark)
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos INT, token STRING, tok_len INT")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" ")):
                yield i, tok, len(tok)

    spark.udtf.register("tokenize_udtf", Tokenize)
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token, t.tok_len
        FROM documents d, LATERAL tokenize_udtf(d.text) t
        WHERE d.doc_id < 50
        """
    )


QUERIES = {
    "udf_scalar": udf_scalar,
    "udtf_python_lateral": udtf_python_lateral,
    "udf_arrow_map": udf_arrow_map,
    "udf_pandas_scalar": udf_pandas_scalar,
    "udf_grouped_map": udf_grouped_map,
    "udaf_pandas": udaf_pandas,
    "udtf_explode": udtf_explode,
}

ORACLES = {
    "udf_scalar": DURATION_ORACLE_SQL,
    "udf_pandas_scalar": (
        "SELECT vec_id, ROUND(SQRT(list_aggregate(list_transform(embedding,"
        " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 4) AS l2_norm"
        " FROM embeddings"
    ),
    "udf_grouped_map": (
        "SELECT c_custkey, c_nationkey,"
        " ROUND((c_acctbal - AVG(c_acctbal) OVER w)"
        "       / STDDEV_SAMP(c_acctbal) OVER w, 4) AS bal_z"
        " FROM customer WINDOW w AS (PARTITION BY c_nationkey)"
    ),
    "udaf_pandas": (
        "SELECT p_brand, ROUND(EXP(AVG(LN(p_retailprice))), 4) AS geo_price,"
        " COUNT(*) AS n_parts FROM part GROUP BY p_brand"
    ),
    "udtf_explode": (
        "SELECT word, COUNT(*) AS cnt FROM ("
        " SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)"
        " GROUP BY word"
    ),
    "udf_arrow_map": (
        "SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim FROM embeddings"
    ),
    "udtf_python_lateral": (
        "SELECT doc_id, CAST(u.i - 1 AS INTEGER) AS pos, u.token,"
        " CAST(length(u.token) AS INTEGER) AS tok_len"
        " FROM documents,"
        " LATERAL (SELECT UNNEST(string_split(text, ' ')) AS token,"
        "          UNNEST(generate_series(1, len(string_split(text, ' '))))"
        "            AS i) u"
        " WHERE doc_id < 50"
    ),
}
