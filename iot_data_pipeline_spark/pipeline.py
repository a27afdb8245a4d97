"""The reference's primary entry point, re-expressed: a spark-submit-able
CSV→Parquet ETL job driven by a YAML config.

Mirrors ``/root/reference/src/jobs/process_iot_data.py`` lifecycle exactly
(SURVEY.md §3 entry point 1): argparse ``--config-path`` → YAML config →
session build (app name / master / AQE flag / generic ``spark.*``
passthrough) → schema-enforced CSV scan → column normalization → quirk
transforms → overwrite-parquet materialization → AnalysisException
path-missing special case → exit-code protocol with ``spark.stop()`` in
``finally``. Credentials for the optional JDBC serving sink come from the
environment only (the reference's dead legacy-config fallback is dropped,
SURVEY.md §2A quirk 4).

Example config::

    input_path: /data/iot23/raw
    output_path: /data/iot23/parquet
    app_name: iot-etl
    master: local[*]
    spark:
      spark.driver.memory: 4g
      spark.sql.adaptive.enabled: "true"
    serving:            # optional; enables --with-load (reference DAG parity)
      url: jdbc:derby:memory:serve;create=true
      table: iot_serving
      driver: org.apache.derby.jdbc.EmbeddedDriver
      user: app

Run: ``spark-submit path/to/iot_data_pipeline_spark/pipeline.py
--config-path cfg.yaml`` (spark-submit takes a script path, not ``-m``) or
``python -m iot_data_pipeline_spark.pipeline --config-path cfg.yaml``; add
``--with-load`` for the full cleanup → etl → truncate → load chain
(reference DAG ``/root/reference/dags/iot_processing_dag.py:26-86``).
"""

from __future__ import annotations

import argparse
import logging
import sys

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession

from iot_data_pipeline_spark.functions.transforms import (
    normalize_columns,
    transform_iot,
)
from iot_data_pipeline_spark.session import build_session
from iot_data_pipeline_spark.sources.readers import read_iot_csv
from iot_data_pipeline_spark.sources.sinks import write_jdbc, write_parquet

log = logging.getLogger(__name__)


def load_config(path: str) -> dict:
    """YAML config → dict (reference ``load_config``, :25-37)."""
    import yaml

    with open(path) as fh:
        cfg = yaml.safe_load(fh) or {}
    if not isinstance(cfg, dict):
        raise ValueError(f"config at {path} is not a mapping")
    return cfg


def process(spark: SparkSession, input_path: str) -> DataFrame:
    """Scan → normalize → transform (lazy; no action)."""
    raw = read_iot_csv(spark, input_path)
    return transform_iot(normalize_columns(raw))


def run(config: dict) -> int:
    """Execute the ETL job; returns a process exit code."""
    pre_existing = SparkSession.getActiveSession() is not None
    spark = build_session(
        app_name=config.get("app_name", "iot_data_pipeline_spark"),
        master=config.get("master"),
        conf=config.get("spark", {}),
    )
    try:
        df = process(spark, config["input_path"])
        df.printSchema()
        write_parquet(
            df,
            config["output_path"],
            mode="overwrite",
            sort_within_partitions=config.get("sort_columns"),
        )
        log.info("wrote parquet to %s", config["output_path"])
        return 0
    except AnalysisException as exc:
        if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc):
            log.error("input path missing: %s", config.get("input_path"))
            return 2
        log.exception("analysis error")
        return 1
    except Exception:
        log.exception("pipeline failed")
        return 1
    finally:
        # getOrCreate may have returned a caller-owned session (embedded
        # use, tests); only stop a session this job itself created.
        if not pre_existing:
            spark.stop()


def run_chain(config: dict) -> int:
    """Reference DAG parity: cleanup_previous_parquet → run_spark_job →
    truncate_serving_table → load_to_serving, sequentially with per-step
    retries (``/root/reference/dags/iot_processing_dag.py:26-86``).

    Spark-first re-expression: the DAG's two clickhouse-client steps
    (TRUNCATE, INSERT FROM file(...)) collapse into one batched JDBC
    overwrite with ``truncate=true`` — same observable refresh (serving DDL
    preserved, table fully replaced), one connection. Idempotent by
    construction: rerunning the chain reproduces, never duplicates.
    The serving password comes from ``CLICKHOUSE_PASSWORD`` env only, like
    the reference (its dead legacy-config fallback is dropped)."""
    retries = int(config.get("retries", 1))

    def attempt(step: str, fn):
        for i in range(retries + 1):
            try:
                return fn()
            except Exception:
                log.exception("step %s failed (attempt %d/%d)", step, i + 1, retries + 1)
                if i == retries:
                    raise
        return None  # unreachable

    import os
    import shutil

    try:
        attempt(
            "cleanup_previous_parquet",
            lambda: shutil.rmtree(config["output_path"], ignore_errors=True),
        )
        code = attempt("run_spark_to_parquet_job", lambda: run(config))
    except Exception:
        return 1
    if code != 0:
        return code
    serving = config.get("serving")
    if not serving:
        log.warning("serving configuration not found; skipping load")
        return 0

    def truncate_and_load() -> None:
        pre_existing = SparkSession.getActiveSession() is not None
        spark = build_session(
            app_name=config.get("app_name", "iot_data_pipeline_spark"),
            master=config.get("master"),
            conf=config.get("spark", {}),
        )
        try:
            df = spark.read.parquet(config["output_path"])
            write_jdbc(
                df,
                url=serving["url"],
                table=serving["table"],
                user=serving.get("user", "default"),
                password=os.getenv("CLICKHOUSE_PASSWORD", ""),
                driver=serving["driver"],
                batchsize=int(serving.get("batch_size", 100_000)),
                mode="overwrite",
                truncate=True,
            )
        finally:
            if not pre_existing:
                spark.stop()

    try:
        attempt("truncate_and_load_serving", truncate_and_load)
    except Exception:
        return 1
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="IoT CSV→Parquet ETL")
    parser.add_argument("--config-path", required=True)
    parser.add_argument(
        "--with-load",
        action="store_true",
        help="run the full cleanup → etl → truncate → load chain "
        "(reference DAG parity) instead of the bare ETL job",
    )
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    config = load_config(args.config_path)
    return run_chain(config) if args.with_load else run(config)


if __name__ == "__main__":
    sys.exit(main())
