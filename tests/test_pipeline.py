"""End-to-end ETL pipeline test: config → CSV scan → transforms → parquet."""

from __future__ import annotations

import os

import yaml

from iot_data_pipeline_spark import pipeline
from iot_data_pipeline_spark.functions.scalar_suites import _write_csv_fixture


def test_pipeline_end_to_end(spark, tmp_path):
    out = str(tmp_path / "out_parquet")
    cfg = {
        "input_path": _write_csv_fixture(),
        "output_path": out,
        "app_name": "etl-test",
        "spark": {"spark.sql.shuffle.partitions": 4, "ignored_key": 1},
        "sort_columns": ["uid"],
    }
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(cfg, fh)

    assert pipeline.main(["--config-path", cfg_path]) == 0
    back = spark.read.parquet(out)
    rows = {r["uid"]: r for r in back.collect()}
    assert len(rows) == 4
    assert rows["u2"]["duration_sec"] is not None
    assert rows["u2"]["local_orig_bool"] is True  # quirk 3: "F" → True
    assert "duration" not in back.columns  # source columns dropped
    assert os.path.exists(out + "/_SUCCESS")


def test_pipeline_missing_path(tmp_path):
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(
            {"input_path": "/nonexistent/nope", "output_path": str(tmp_path / "o")},
            fh,
        )
    assert pipeline.main(["--config-path", cfg_path]) == 2


def test_pipeline_chain_idempotent(spark, tmp_path):
    """Reference-DAG-parity chain (cleanup → etl → truncate → load) against
    embedded Derby: running it TWICE leaves the same serving rows — the
    truncate step makes the refresh idempotent, never additive."""
    cfg = {
        "input_path": _write_csv_fixture(),
        "output_path": str(tmp_path / "chain_parquet"),
        "app_name": "etl-chain-test",
        "serving": {
            "url": "jdbc:derby:memory:chain;create=true",
            "table": "iot_serving",
            "driver": "org.apache.derby.jdbc.EmbeddedDriver",
            "user": "app",
        },
    }
    cfg_path = str(tmp_path / "chain.yaml")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(cfg, fh)

    assert pipeline.main(["--config-path", cfg_path, "--with-load"]) == 0
    props = {"driver": cfg["serving"]["driver"]}
    first = spark.read.jdbc(cfg["serving"]["url"], "iot_serving", properties=props)
    rows_first = sorted(map(tuple, first.collect()))
    assert len(rows_first) == 4  # the fixture's row count, post-ETL

    assert pipeline.main(["--config-path", cfg_path, "--with-load"]) == 0
    second = spark.read.jdbc(cfg["serving"]["url"], "iot_serving", properties=props)
    assert sorted(map(tuple, second.collect())) == rows_first


def test_pipeline_chain_without_serving_is_bare_etl(spark, tmp_path):
    """No serving config → the chain degrades to cleanup + ETL and still
    succeeds (reference skips the ClickHouse write when unconfigured)."""
    out = str(tmp_path / "noserve_parquet")
    cfg = {"input_path": _write_csv_fixture(), "output_path": out}
    cfg_path = str(tmp_path / "noserve.yaml")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(cfg, fh)
    assert pipeline.main(["--config-path", cfg_path, "--with-load"]) == 0
    assert spark.read.parquet(out).count() == 4


def test_pipeline_chain_failed_load_exit_code(spark, tmp_path):
    """A serving step that keeps failing (bogus JDBC driver) exhausts its
    retries and surfaces as exit code 1, not a traceback."""
    cfg = {
        "input_path": _write_csv_fixture(),
        "output_path": str(tmp_path / "failserve_parquet"),
        "retries": 1,
        "serving": {
            "url": "jdbc:nosuch://nowhere",
            "table": "t",
            "driver": "com.example.NoSuchDriver",
        },
    }
    cfg_path = str(tmp_path / "failserve.yaml")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(cfg, fh)
    assert pipeline.main(["--config-path", cfg_path, "--with-load"]) == 1
