"""Plan-inspection helpers (used by tests and perf work)."""

from iot_data_pipeline_spark.plans.explain import (  # noqa: F401
    executed_plan,
    has_broadcast_join,
    has_take_ordered,
    pushed_filters,
    scan_columns,
)
