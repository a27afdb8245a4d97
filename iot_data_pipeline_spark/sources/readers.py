"""Readers: the reference's CSV scan contract + the testdata parquet catalog.

CSV contract (reference S1, ``/root/reference/src/jobs/process_iot_data.py:245-253``):
explicit 22-column schema, ``header=True``, ``sep=','``, ``nullValue='-'``
(Zeek's unset marker), ``recursiveFileLookup=True``, ``enforceSchema=True``.
Enforcing the schema skips Spark's CSV inference pass — one scan, not two —
which matters at 39 GB+ of input.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# The reference's enforced input schema, 1:1
# (/root/reference/src/jobs/process_iot_data.py:79-104). Column names keep the
# raw dots/hyphens; normalize_columns() rewrites them after the scan.
IOT_SCHEMA = StructType(
    [
        StructField("uid", StringType(), True),
        StructField("id.orig_h", StringType(), True),
        StructField("id.orig_p", IntegerType(), True),
        StructField("id.resp_h", StringType(), True),
        StructField("id.resp_p", IntegerType(), True),
        StructField("proto", StringType(), True),
        StructField("service", StringType(), True),
        StructField("duration", StringType(), True),
        StructField("orig_bytes", LongType(), True),
        StructField("resp_bytes", LongType(), True),
        StructField("conn_state", StringType(), True),
        StructField("local_orig", StringType(), True),
        StructField("local_resp", StringType(), True),
        StructField("missed_bytes", LongType(), True),
        StructField("history", StringType(), True),
        StructField("orig_pkts", LongType(), True),
        StructField("orig_ip_bytes", LongType(), True),
        StructField("resp_pkts", LongType(), True),
        StructField("resp_ip_bytes", LongType(), True),
        StructField("tunnel_parents", StringType(), True),
        StructField("label", StringType(), True),
        StructField("detailed-label", StringType(), True),
    ]
)

# Tables the driver generates at /root/testdata/sf*/ (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_iot_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    **options,
) -> DataFrame:
    """Scan IoT-23-style CSV with the reference's exact reader contract.
    Extra ``options`` (e.g. ``mode='FAILFAST'``) layer on top of it."""
    return spark.read.csv(
        path,
        header=True,
        schema=schema or IOT_SCHEMA,
        sep=",",
        nullValue="-",
        recursiveFileLookup=True,
        enforceSchema=True,
        **options,
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. Plain parquet scan: Catalyst gets min/max
    stats, predicate pushdown, and column pruning for free.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    TimestampType (µs) rejects outright; read it as raw nanos via the
    ``nanosAsLong`` legacy conf and truncate to µs — the same truncation
    DuckDB applies casting TIMESTAMP_NS → TIMESTAMP, so oracles agree.
    The conf is scoped to the read (set, resolve the scan schema, restore)
    so it never leaks into the caller's session: later parquet reads of
    nanos columns fail loudly instead of silently yielding raw longs.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        key = "spark.sql.legacy.parquet.nanosAsLong"
        prev = spark.conf.get(key)
        spark.conf.set(key, "true")
        try:
            # .read.parquet resolves the schema eagerly, which is the only
            # point this conf is consulted (verified value-identical with
            # the conf restored before any action runs).
            df = spark.read.parquet(path)
        finally:
            spark.conf.set(key, prev)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    """Load several testdata tables at once."""
    return [load_table(spark, sf_dir, n) for n in (names or TABLES)]
