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
