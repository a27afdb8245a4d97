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


def _load_entry_mod(tmp_root=None):
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "_entry_attest", os.path.join(root, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    if tmp_root is not None:
        mod._REPO_ROOT = str(tmp_root)
    return mod


def test_src_fingerprint_tracks_helpers_and_constants(tmp_path):
    """The rework detector must see one-module-deep: a change to a helper
    the registered callable delegates to, or to a module constant it reads
    (caps, schedules), must change the fingerprint even when the registered
    function's own text is untouched."""
    import importlib.util
    import sys

    entry = _load_entry_mod()

    def write_mod(name, cap, helper_body):
        p = tmp_path / f"{name}.py"
        p.write_text(
            f"_CAP = {cap}\n"
            f"def _helper(x):\n    return {helper_body}\n"
            "def op(x):\n    return _helper(x) + _CAP\n"
        )
        spec = importlib.util.spec_from_file_location(name, p)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    base = entry.src_fingerprint(write_mod("_fp_a", 7, "x * 2").op)
    same = entry.src_fingerprint(write_mod("_fp_b", 7, "x * 2").op)
    const_changed = entry.src_fingerprint(write_mod("_fp_c", 8, "x * 2").op)
    helper_changed = entry.src_fingerprint(write_mod("_fp_d", 7, "x * 3").op)
    for name in ("_fp_a", "_fp_b", "_fp_c", "_fp_d"):
        sys.modules.pop(name, None)
    assert base == same  # deterministic across equal-source modules
    assert const_changed != base  # constant edits detected
    assert helper_changed != base  # delegated-helper edits detected


def test_attestation_is_rework_aware(tmp_path):
    """An id whose implementing code changed since its last driver-green row
    must order as never-attested (ahead of every attested id), while an id
    whose stamped fingerprint still matches keeps its round."""
    import json

    mod = _load_entry_mod(tmp_path)
    registry = {}
    for m in mod._MODULES:
        registry.update(m.QUERIES)
    fresh_id, stale_id = "scan_parquet", "filter_pred"
    rows = {
        qid: {"rows_match": True, "schema_match": True, "hash_match": True,
              "spark_rows": 1, "oracle_rows": 1, "err": None}
        for qid in (fresh_id, stale_id)
    }
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(rows))
    sidecar = {
        fresh_id: {"round": 1, "fp": mod.src_fingerprint(registry[fresh_id])},
        stale_id: {"round": 1, "fp": "stale:reworked"},
    }
    (tmp_path / "ATTESTATIONS.json").write_text(json.dumps(sidecar))

    effective = mod._attestation_round(registry)
    assert effective.get(fresh_id) == 1
    assert stale_id not in effective  # mismatch -> treated as never attested

    ids = list(mod.queries())
    assert ids.index(stale_id) < ids.index(fresh_id)

    # Sidecar absent -> graceful round-only fallback, driver never breaks.
    (tmp_path / "ATTESTATIONS.json").unlink()
    fallback = mod._attestation_round(registry)
    assert fallback.get(stale_id) == 1 and fallback.get(fresh_id) == 1


def test_attest_regen_keeps_prior_stamp_at_max_round():
    """A second regen later in the round must NOT re-stamp the current
    fingerprint over a prior entry for the same (just-landed) round: the
    driver earned that row against pre-edit code, and restamping post-edit
    fingerprints would silently certify reworked code (r8 ADVICE item 1)."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "_tools_attest", os.path.join(root, "tools_attest.py")
    )
    ta = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ta)

    registry = {"a": lambda: None, "b": lambda: None, "c": lambda: None}
    latest = {"a": 2, "b": 2, "c": 1}
    existing = {
        "a": {"round": 2, "fp": "fp-earned-pre-edit"},  # maxr, prior stamp
        "c": {"round": 1, "fp": "fp-old-round"},
    }
    calls = []

    def fingerprint(fn):
        calls.append(fn)
        return "fp-current-head"

    sidecar, stamped, kept, overridden = ta.regenerate(
        registry, latest, existing, set(), fingerprint
    )
    # a: prior same-round entry KEPT verbatim, fingerprint() never called on it
    assert sidecar["a"] == {"round": 2, "fp": "fp-earned-pre-edit"}
    # b: first stamp for the just-landed round -> current fp is faithful
    assert sidecar["b"] == {"round": 2, "fp": "fp-current-head"}
    # c: old round with matching prior -> kept
    assert sidecar["c"] == {"round": 1, "fp": "fp-old-round"}
    assert (stamped, kept, overridden) == (1, 2, 0)
    assert calls == [registry["b"]]

    # Old round WITHOUT a matching prior -> conservative stale sentinel
    # (maxr pinned to 2 by id "b" so "c"'s round 1 is genuinely old).
    sidecar2, _, _, over2 = ta.regenerate(
        {"b": registry["b"], "c": registry["c"]},
        {"b": 2, "c": 1},
        {},
        set(),
        fingerprint,
    )
    assert sidecar2["c"]["fp"].startswith("stale:unstamped")
    assert over2 == 1


def test_src_fingerprint_is_memoized():
    """queries() recomputes ordering per invocation; the transitive
    getsource walk must run once per callable per process (r8 ADVICE)."""
    mod = _load_entry_mod()
    registry = {}
    for m in mod._MODULES:
        registry.update(m.QUERIES)
    fn = registry["scan_parquet"]
    first = mod.src_fingerprint(fn)
    assert mod._FP_CACHE[fn] == first
    # Poison the cache: a second call must hit it, not recompute.
    mod._FP_CACHE[fn] = "cached-sentinel"
    assert mod.src_fingerprint(fn) == "cached-sentinel"
    # The escape hatch for long-lived processes spanning on-disk edits
    # (r9 ADVICE): clearing drops the memo so the next call recomputes
    # the real fingerprint from current source.
    mod.clear_fingerprint_cache()
    assert fn not in mod._FP_CACHE
    assert mod.src_fingerprint(fn) == first


def test_bench_band_check_is_mechanical():
    """BENCH_BANDS.json + bench._band_check form the mechanical per-query
    regression gate (r9 verdict item 6): >ref*1.5+0.3 s trips, quiet jitter
    does not, contention is reported (not used to excuse a regression), and
    bands only apply at the reference scale."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    bands = json.load(
        open(os.path.join(os.path.dirname(bench.__file__), "BENCH_BANDS.json"))
    )
    # every headline query has a committed reference wall
    assert set(bench.HEADLINE) <= set(bands["ref"])
    ref = bands["ref"]["llm_sim_hnsw"]
    ok = bench._band_check({"llm_sim_hnsw": ref * 1.2}, 200.0, 0.1)
    assert ok["band_ok"] and not ok["regressions"]
    bad = bench._band_check({"llm_sim_hnsw": ref * 2 + 1}, 200.0, 0.1)
    assert not bad["band_ok"] and "llm_sim_hnsw" in bad["regressions"]
    # contention signal is independent of band_ok
    cont = bench._band_check({"llm_sim_hnsw": ref}, 10.0, 0.1)
    assert cont["host_contended"] and cont["band_ok"]
    # bands are sf0.1-scoped
    assert bench._band_check({"llm_sim_hnsw": 999.0}, 200.0, 0.01) == {}


def test_llm_hybrid_staging_scheme_is_copy_disjoint(monkeypatch):
    """The LLM pressure staging's linear-density premise rests on copies
    being SHINGLE-disjoint (r10 review found the prefix scheme collided for
    copies >= 10: 'c1'+'0foo' == 'c10'+'foo'; the `_` separator fixed
    that). The FIRST token of each doc is never prefixed (no leading
    space), so token sets may share first words — harmless, because every
    word trigram contains at least two prefixed tokens. Pin with Spark-free
    DuckDB at copies=12 over sf0.001: copy 1 and copy 10 share ZERO
    trigram shingles (the quantity the dedup family actually joins on),
    row counts replicate exactly, n_chars tracks the rewritten text, and
    the staging dir is keyed to the source corpus (a different source
    yields a different dir)."""
    import os
    import sys

    import duckdb

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    import tools_pressure_probe as probe

    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    d = probe._llm_hybrid_dir(12)
    con = duckdb.connect()
    n, nd = con.sql(
        f"SELECT count(*), count(DISTINCT doc_id) FROM '{d}/documents.parquet'"
    ).fetchone()
    base = con.sql(
        "SELECT count(*) FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchone()[0]
    assert n == nd == 12 * base
    overlap = con.sql(
        f"""WITH arrs AS (
              SELECT doc_id // 1000000 AS cp, string_split(text, ' ') AS arr
              FROM '{d}/documents.parquet'
              WHERE doc_id // 1000000 IN (1, 10)
            ), sh AS (
              SELECT cp,
                     arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS s
              FROM arrs, unnest(range(1, greatest(len(arr) - 1, 1))) AS u(i)
            )
        SELECT count(*) FROM
          (SELECT DISTINCT s FROM sh WHERE cp = 1)
          JOIN (SELECT DISTINCT s FROM sh WHERE cp = 10)
          USING (s)"""
    ).fetchone()[0]
    assert overlap == 0, f"copies 1 and 10 share {overlap} shingles"
    bad_len = con.sql(
        f"SELECT count(*) FROM '{d}/documents.parquet'"
        " WHERE n_chars <> length(text)"
    ).fetchone()[0]
    assert bad_len == 0
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    d2 = probe._llm_hybrid_dir(12)
    assert d2 != d, "staging dir must be keyed to the source corpus"
