"""Physical-plan inspection: the engine's "is this the plan I'd want at
100 TB" checks, kept executable so they run in CI instead of living in a
reviewer's head.

The properties asserted here are the ones that decide whether a plan
survives a 100× scale-up: filters reaching the parquet scan, scans pruned
to referenced columns, dimension joins broadcast, global top-k running as
TakeOrderedAndProject instead of a total sort.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Physical plan string (pre-execution AQE plan)."""
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> str:
    """Concatenated DataFilters/PushedFilters text from every scan node."""
    plan = executed_plan(df)
    return " ".join(
        m.group(0)
        for m in re.finditer(r"(?:Pushed|Data)Filters: \[[^\]]*\]", plan)
    )


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Column lists read by each FileScan (column-pruning check)."""
    plan = executed_plan(df)
    out = []
    for m in re.finditer(r"FileScan \w+ \[([^\]]*)\]", plan):
        cols = [c.split("#")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in executed_plan(df)
