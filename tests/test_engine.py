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


def test_engine_default_sf_dir(spark, sf_dir):
    """The documented usage — register_tables then query(name) with no
    explicit directory — must work; querying with neither raises."""
    from iot_data_pipeline_spark.engine import Engine

    import pytest

    eng = Engine(spark)
    with pytest.raises(ValueError, match="sf_dir"):
        eng.query("agg_count_star")
    eng.register_tables(sf_dir, names=("nation",))
    assert eng.query("agg_count_star").count() == 1


def test_verify_local_type_parity_flags_hugeint_and_decimal():
    """The local gate must be at least as strict as the driver's
    type-sensitive hash (round-3 verdict item 2): an uncast integer SUM
    (HUGEINT in DuckDB) or a DECIMAL-vs-DOUBLE divergence is a failure
    even when every value matches."""
    import importlib.util
    import os

    import duckdb

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "verify_local.py",
    )
    spec = importlib.util.spec_from_file_location("_vl", path)
    vl = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vl)

    con = duckdb.connect()
    q = "SELECT SUM(x) AS s FROM (VALUES (1), (2)) t(x)"
    probs = vl._oracle_type_problems(con, q, ["s"], ["bigint"])
    assert probs and "HUGEINT" in probs[0]
    fixed = "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (VALUES (1), (2)) t(x)"
    assert vl._oracle_type_problems(con, fixed, ["s"], ["bigint"]) == []
    # DuckDB DECIMAL vs Spark double must be flagged, not silently hashed
    probs = vl._oracle_type_problems(con, "SELECT 1.5 AS v", ["v"], ["double"])
    assert probs and "DECIMAL" in probs[0]


def test_verify_local_flags_driver_unsortable_output_shapes():
    """The local gate must reject the round-4 failure shape: an
    array/map/struct output column crashes the driver's pandas
    sort_values canonicalizer, so the pre-fix llm_embed_quantize schema
    (vec_id + array<bigint> qvec) must FAIL the pre-flight and the
    post-fix long form must pass."""
    import importlib.util
    import os

    from pyspark.sql import types as T

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "verify_local.py",
    )
    spec = importlib.util.spec_from_file_location("_vl_shapes", path)
    vl = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vl)

    prefix = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("qvec", T.ArrayType(T.LongType())),
        ]
    )
    assert vl._driver_unsortable_cols(prefix) == ["qvec"]
    postfix = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("dim", T.LongType()),
            T.StructField("q", T.LongType()),
        ]
    )
    assert vl._driver_unsortable_cols(postfix) == []
    mapy = T.StructType(
        [T.StructField("m", T.MapType(T.StringType(), T.LongType()))]
    )
    assert vl._driver_unsortable_cols(mapy) == ["m"]
    structy = T.StructType(
        [
            T.StructField(
                "s", T.StructType([T.StructField("a", T.LongType())])
            )
        ]
    )
    assert vl._driver_unsortable_cols(structy) == ["s"]


def test_all_registry_oracles_use_portable_result_types(sf_dir):
    """Spark-free sweep of every registered oracle: DESCRIBE on the test-sf
    views must produce no HUGEINT/UHUGEINT (DuckDB's integer-SUM
    widening — the round-3 driver hash-FAIL class) and no TIMESTAMP WITH
    TIME ZONE (tz-aware vs Spark's naive session-TZ collect). Runs in
    seconds, so the discipline lives in the default pytest gate, not only
    in the slower verify sweep."""
    import importlib.util
    import os

    import duckdb

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "_entry_types", os.path.join(root, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from iot_data_pipeline_spark.sources.readers import TABLES

    sf = sf_dir
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    oracles = dict(mod.oracle_sql())
    bad = []
    for name, sql in oracles.items():
        for row in con.execute(f"DESCRIBE {sql}").fetchall():
            dtype = row[1].upper()
            if "HUGEINT" in dtype or "WITH TIME ZONE" in dtype:
                bad.append((name, row[0], row[1]))
    assert bad == [], bad
