"""Sinks: parquet full-refresh materialization + batched JDBC.

Reference S2 (``/root/reference/src/jobs/process_iot_data.py:266``): overwrite
parquet. Reference S3 (``:190-233``): JDBC with 100k batch size — defined but
dead in the reference's live path; here it is a real, gated writer (no
ClickHouse in CI, so it is integration-only and not registered in queries()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    sort_within_partitions: list[str] | None = None,
) -> None:
    """Materialize to parquet.

    ``partition_by`` gives partition pruning on the listed columns at read
    time; ``sort_within_partitions`` tightens per-row-group min/max stats so
    point lookups on the sort key skip row groups — the engine's substitute
    for the reference's ClickHouse ``ORDER BY uid`` MergeTree index
    (``/root/reference/clickhouse_scripts/init_db.sql:30-31``).
    """
    if sort_within_partitions:
        df = df.sortWithinPartitions(*sort_within_partitions)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    user: str,
    password: str,
    driver: str = "com.clickhouse.jdbc.ClickHouseDriver",
    batchsize: int = 100_000,
    mode: str = "append",
    socket_timeout_ms: int = 300_000,
    truncate: bool = False,
) -> None:
    """Batched JDBC write (reference S3 contract, credentials env-only —
    the reference's dead legacy-config fallback is intentionally dropped,
    SURVEY.md §2A quirk 4).

    ``truncate=True`` with ``mode='overwrite'`` issues TRUNCATE TABLE +
    INSERT instead of DROP + CREATE, preserving the serving table's DDL
    (engine/indexes) — the reference DAG's truncate→load refresh
    (``/root/reference/dags/iot_processing_dag.py:57-75``) as one writer."""
    props = {
        "user": user,
        "password": password,
        "driver": driver,
        "batchsize": str(batchsize),
        "socket_timeout": str(socket_timeout_ms),
    }
    if truncate:
        props["truncate"] = "true"
    df.write.jdbc(url=url, table=table, mode=mode, properties=props)
