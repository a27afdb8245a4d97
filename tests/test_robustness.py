"""Results must be configuration-independent: AQE off, different shuffle
partition counts, and broadcast disabled all change the PHYSICAL plan but
never the result (the determinism conventions guarantee it)."""

from __future__ import annotations

import pytest

from iot_data_pipeline_spark.operators import relational

CASES = [
    ("spark.sql.adaptive.enabled", "false"),
    ("spark.sql.shuffle.partitions", "3"),
    ("spark.sql.autoBroadcastJoinThreshold", "-1"),
]


@pytest.mark.parametrize("conf_key,conf_val", CASES)
def test_results_invariant_to_physical_config(spark, sf_dir, conf_key, conf_val):
    baseline = {
        tuple(r) for r in relational.join_multiway(spark, sf_dir).collect()
    }
    prev = spark.conf.get(conf_key)
    try:
        spark.conf.set(conf_key, conf_val)
        perturbed = {
            tuple(r) for r in relational.join_multiway(spark, sf_dir).collect()
        }
    finally:
        spark.conf.set(conf_key, prev)
    assert perturbed == baseline
