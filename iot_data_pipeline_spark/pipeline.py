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

Run: ``spark-submit -m iot_data_pipeline_spark.pipeline --config-path cfg.yaml``
or ``python -m iot_data_pipeline_spark.pipeline --config-path cfg.yaml``.
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
from iot_data_pipeline_spark.sources.sinks import write_parquet

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


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="IoT CSV→Parquet ETL")
    parser.add_argument("--config-path", required=True)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    return run(load_config(args.config_path))


if __name__ == "__main__":
    sys.exit(main())
