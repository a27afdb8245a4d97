"""Scalar-expression libraries (all JVM-side built-ins unless noted)."""

from iot_data_pipeline_spark.functions.transforms import (  # noqa: F401
    blank_to_null,
    duration_to_seconds,
    flag_to_bool,
    normalize_columns,
    transform_iot,
)
