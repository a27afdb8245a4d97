"""Results must be configuration-independent: AQE off, different shuffle
partition counts, and broadcast disabled all change the PHYSICAL plan but
never the result (the determinism conventions guarantee it).

The query list deliberately includes every operator whose implementation
leans on physical placement: win_ntile_dist (distributed global rank —
correct wherever the sampled range boundaries fall), graph_pagerank
(iterative scaled-integer — aggregation-order-free by construction),
llm_pack_sequences (sub-sharded packing windows), and the broadcast-heavy
join_multiway.
"""

from __future__ import annotations

import pytest

from iot_data_pipeline_spark.operators import (
    analytics,
    llm,
    maintenance,
    relational,
    reshape,
)

CASES = [
    ("spark.sql.adaptive.enabled", "false"),
    ("spark.sql.shuffle.partitions", "3"),
    ("spark.sql.autoBroadcastJoinThreshold", "-1"),
]

QUERIES = {
    "join_multiway": relational.join_multiway,
    "win_ntile_dist": reshape.win_ntile_dist,
    "graph_pagerank": maintenance.graph_pagerank,
    "llm_pack_sequences": llm.llm_pack_sequences,
    # as-of join: tie-breaking must come from the declared sort keys, not
    # from whatever order a partition happened to deliver rows in
    "join_asof_event": relational.join_asof_event,
    # iterative min-label propagation: convergence must not depend on how
    # edges are partitioned across the label-join shuffles
    "llm_dedup_clusters": llm.llm_dedup_clusters,
    # distributed prefix sum over the day spine feeding cum_users
    "evt_cumulative_users": analytics.evt_cumulative_users,
}


@pytest.mark.parametrize("qname", sorted(QUERIES))
@pytest.mark.parametrize("conf_key,conf_val", CASES)
def test_results_invariant_to_physical_config(
    spark, sf_dir, qname, conf_key, conf_val
):
    fn = QUERIES[qname]
    spark.catalog.clearCache()
    baseline = {tuple(r) for r in fn(spark, sf_dir).collect()}
    prev = spark.conf.get(conf_key)
    try:
        spark.conf.set(conf_key, conf_val)
        spark.catalog.clearCache()  # don't serve the perturbed run from cache
        perturbed = {tuple(r) for r in fn(spark, sf_dir).collect()}
    finally:
        spark.conf.set(conf_key, prev)
        spark.catalog.clearCache()
    assert perturbed == baseline
