"""Testdata schema drift guard.

Round 2 was broken by a silent testdata regeneration (``events.ts`` changed
parquet type TIMESTAMP(NANOS) → TIMESTAMP(MICROS)) that turned into 41 dead
queries before anyone saw a type name. This module turns the next drift into
a one-line diagnosis: ``check_testdata_schemas(sf_dir)`` asserts every
table's *parquet* (pyarrow) schema against the expectation below and raises
with the observed arrow types on mismatch. Cheap — footer reads only, no
Spark session needed — so it runs at test-session start (conftest) and at
verify_local startup.

Columns whose physical type legitimately varies across known testdata
generations list every accepted spelling (e.g. ``events.ts``; the loader in
``readers.py`` normalizes all of them to session-TZ TimestampType).
"""

from __future__ import annotations

import os

# table -> {column: accepted arrow type strings}
EXPECTED: dict[str, dict[str, tuple[str, ...]]] = {
    "region": {"r_regionkey": ("int32",), "r_name": ("string",)},
    "nation": {
        "n_nationkey": ("int32",),
        "n_name": ("string",),
        "n_regionkey": ("int32",),
    },
    "customer": {
        "c_custkey": ("int64",),
        "c_name": ("string",),
        "c_nationkey": ("int32",),
        "c_acctbal": ("double",),
        "c_mktsegment": ("string",),
    },
    "supplier": {
        "s_suppkey": ("int64",),
        "s_name": ("string",),
        "s_nationkey": ("int32",),
        "s_acctbal": ("double",),
    },
    "part": {
        "p_partkey": ("int64",),
        "p_name": ("string",),
        "p_brand": ("string",),
        "p_type": ("string",),
        "p_size": ("int32",),
        "p_retailprice": ("double",),
    },
    "orders": {
        "o_orderkey": ("int64",),
        "o_custkey": ("int64",),
        "o_orderstatus": ("string",),
        "o_totalprice": ("double",),
        "o_orderdate": ("timestamp[us]", "timestamp[ns]", "date32[day]"),
        "o_orderpriority": ("string",),
    },
    "lineitem": {
        "l_orderkey": ("int64",),
        "l_partkey": ("int64",),
        "l_suppkey": ("int64",),
        "l_linenumber": ("int32",),
        "l_quantity": ("double",),
        "l_extendedprice": ("double",),
        "l_discount": ("double",),
        "l_tax": ("double",),
        "l_returnflag": ("string",),
        "l_linestatus": ("string",),
        "l_shipdate": ("timestamp[us]", "timestamp[ns]", "date32[day]"),
    },
    "events": {
        "event_id": ("int64",),
        # every generation seen so far; load_table normalizes all of these
        "ts": ("timestamp[us]", "timestamp[ns]", "int64"),
        "user_id": ("int64",),
        "event_type": ("string",),
        "value": ("double",),
        "props": ("string",),
    },
    "documents": {
        "doc_id": ("int64",),
        "text": ("string",),
        "lang": ("string",),
        "source": ("string",),
        "n_chars": ("int64",),
    },
    "embeddings": {
        "vec_id": ("int64",),
        "embedding": ("list<element: float>", "list<item: float>"),
        "label": ("int32",),
    },
}


def check_testdata_schemas(sf_dir: str) -> None:
    """Raise AssertionError naming table/column/observed-type on any drift."""
    import pyarrow.parquet as pq

    problems: list[str] = []
    for name, cols in EXPECTED.items():
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            problems.append(f"{name}: file missing at {path}")
            continue
        schema = pq.read_schema(path)
        observed = {f.name: str(f.type) for f in schema}
        for col, accepted in cols.items():
            got = observed.get(col)
            if got is None:
                problems.append(f"{name}.{col}: column missing (has {sorted(observed)})")
            elif got not in accepted:
                problems.append(
                    f"{name}.{col}: observed arrow type {got!r}, expected one of {accepted}"
                )
        extra = set(observed) - set(cols)
        if extra:
            problems.append(f"{name}: unexpected new columns {sorted(extra)}")
    if problems:
        raise AssertionError(
            "TESTDATA SCHEMA DRIFT at %s — update readers/oracles before trusting results:\n  %s"
            % (sf_dir, "\n  ".join(problems))
        )
