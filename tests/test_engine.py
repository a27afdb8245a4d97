"""Facade test: the three entry points through one Engine object."""

from __future__ import annotations

from iot_data_pipeline_spark.engine import Engine
from iot_data_pipeline_spark.functions.scalar_suites import _write_csv_fixture


def test_engine_facade(spark, sf_dir, tmp_path):
    eng = Engine(spark)

    # entry point 1: ETL
    out = str(tmp_path / "etl_out")
    eng.ingest_csv(_write_csv_fixture(), out)
    assert spark.read.parquet(out).count() == 4

    # catalog + entry point 3: SQL
    eng.register_tables(sf_dir, names=("lineitem", "orders"))
    n = eng.sql("SELECT count(*) AS c FROM lineitem").first()["c"]
    assert n == 6000

    # named operator library
    top = eng.query("sort_limit", sf_dir)
    assert top.count() == 10

    # streaming surfaces
    assert eng.stream_events(sf_dir).count() == 1000
    sensor = eng.sensor_stream(devices=2, rows_per_batch=5)
    assert sensor.isStreaming and "temperature" in sensor.columns
