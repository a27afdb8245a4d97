"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` maps every
implemented SURVEY.md §2B operator id to a ``(spark, sf_dir) -> DataFrame``;
``oracle_sql()`` gives the DuckDB-equivalent SQL for hash-match verification.
Operator implementations live in ``iot_data_pipeline_spark``; this module is
pure registry.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver may invoke this file from anywhere; make the package importable.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from iot_data_pipeline_spark.functions import scalar_suites  # noqa: E402
from iot_data_pipeline_spark.operators import (  # noqa: E402
    analytics,
    llm,
    maintenance,
    multimodal,
    relational,
    reshape,
    skew,
    udfs,
)
from iot_data_pipeline_spark.sources import iot_simulator  # noqa: E402
from iot_data_pipeline_spark.streaming import streams  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: 5-way join region→nation→customer→orders→lineitem
    with per-region revenue aggregation (scan + broadcast join + shuffle
    join + hash agg in one plan) at sf0.001."""
    return relational.join_multiway(spark, "/root/testdata/sf0.001")


_MODULES = [
    relational,
    reshape,
    analytics,
    maintenance,
    scalar_suites,
    udfs,
    llm,
    multimodal,
    streams,
    iot_simulator,
    skew,
]


def _attestation_round() -> dict[str, int]:
    """Latest round in which each query id earned a driver-verified row in
    CORRECTNESS_r*.json (hash-green, or ran under the declared rows-only
    check). The driver verifies a bounded prefix of the registry per round
    (50 ids), so ``queries()`` orders ids by STALEST attestation first:
    never-attested ids lead (round 0), then ids whose newest green row is
    oldest — across rounds every id's attestation keeps rotating onto
    current code instead of resting on the round that introduced it."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json"))):
        try:
            rnd = int(os.path.basename(path)[len("CORRECTNESS_r") : -len(".json")])
        except ValueError:
            continue
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for qid, row in rows.items():
            if not isinstance(row, dict):
                continue
            hash_green = row.get("hash_match") and row.get("rows_match")
            rows_only_ran = (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            )
            if hash_green or rows_only_ran:
                latest[qid] = max(rnd, latest.get(qid, 0))
    return latest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2B/§2C, ordered
    stalest-driver-attestation first (see ``_attestation_round``); ties
    keep registry insertion order so results are stable within a round."""
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        merged.update(mod.QUERIES)
    rounds = _attestation_round()
    order = sorted(
        enumerate(merged.items()), key=lambda t: (rounds.get(t[1][0], 0), t[0])
    )
    return {k: v for _, (k, v) in order}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query id (omitted ids → rows-only)."""
    merged: dict[str, str] = {}
    for mod in _MODULES:
        merged.update(mod.ORACLES)
    return merged
