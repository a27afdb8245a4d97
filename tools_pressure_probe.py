"""Memory-pressure (spill) + small-files (bin-packing) probes — round 9.

Two scale-killer classes no prior ritual exercised directly:

``mem`` — **does a memory-tight executor spill or die?** At 100 TB an
executor's share of a shuffle partition routinely exceeds execution memory;
the difference between a plan that SPILLS (UnsafeExternalSorter /
hash-agg fallback) and one that OOMs is the difference between a slow stage
and a dead job. The probe stages the 125x uniform fact (12.5M events /
18.75M orders, via tools_skew_probe staging) and runs four memory-hungry
shapes — global sort, no-broadcast sort-merge join, 12.5M-group hash
aggregate, per-key window rank — in FRESH subprocess JVMs pinned to small
heaps (default 1g/16g) under two shuffle widths (32 vs 256) AND two
task-slot counts (32 vs 4): heap/slots is the per-task memory floor, i.e.
the executor cores-per-GB sizing knob. Per cell it records ok/OOM, wall
seconds, and the stage-aggregated memory/disk spill bytes from the local
REST status API. The 100 TB story the numbers test: below a per-task floor
(1g/32 slots ≈ 13 MB/task) Spark's sorters cannot even allocate a page and
the JVM dies with heap OOM — no amount of spilling saves an executor sized
too many-cores-per-GB — while at a sane slots-per-GB the same shapes
complete by SPILLING, and widening ``spark.sql.shuffle.partitions`` shrinks
per-task footprint further. "Size shuffle partitions AND cores-per-GB so
partitions fit in executor memory", measured.

``files`` — **does the scan survive a fragmented object store?** Streaming
ingest at 100 TB leaves millions of small files. The probe writes the 25x
events fact as 4096 tiny parquet files and measures the same scan+aggregate
three ways: Spark's default file bin-packing (openCostInBytes packs many
files per task), a deliberately defeated packing (maxPartitionBytes below
the file size -> one task per file, the pathological listing), and after a
``coalesce`` compaction rewrite (the ``sink_compact_files`` maintenance
shape). Scan task counts are recorded alongside wall time, so the datum is
structural (task explosion), not just a local timing.

Usage:
  python tools_pressure_probe.py mem   [--copies 125] [--heaps 1g,16g]
                                       [--shuffles 32,256] [--cpus-list 32,4]
                                       [--skip-stage]
  python tools_pressure_probe.py mem   --registry id1,id2,...  # REGISTERED
      engine operators instead of the generic shapes, run against a hybrid
      staging dir (125x events/orders/customer + sf0.1 symlinks for every
      other table) so any registry id runs with the big facts scaled
  python tools_pressure_probe.py files [--copies 25] [--nfiles 4096]
  (``mem --child ...`` is the internal subprocess entry.)

Writes one JSON line per cell and a summary table to stdout; NOTES_r09
records the tables.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
import urllib.request

REPO = os.path.dirname(os.path.abspath(__file__))
SHAPES = ("sort_global", "join_smj", "agg_highcard", "window_rank")


def _mem_queries(spark, d: str):
    """Shape name -> lazily-built DataFrame over staging dir ``d``. All four
    are deliberately memory-hungry per task: wide sorts, an SMJ whose both
    sides sort, a hash aggregate with one group per input row (guaranteed
    fallback past any in-memory map), and a window whose every partition
    must sort."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{d}/events.parquet")
    od = spark.read.parquet(f"{d}/orders.parquet")

    def sort_global():
        return ev.orderBy("value", "event_id")

    def join_smj():
        return ev.join(od, ev.user_id == od.o_custkey).select(
            "event_id", "o_orderkey", "value", "o_totalprice"
        )

    def agg_highcard():
        # one group per event_id: the hash map can never hold the groups
        return ev.groupBy("event_id").agg(
            F.sum("value").alias("v"), F.count("*").alias("n")
        )

    def window_rank():
        w = Window.partitionBy("user_id").orderBy(F.desc("ts"), "event_id")
        return ev.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 5)

    return {
        "sort_global": sort_global,
        "join_smj": join_smj,
        "agg_highcard": agg_highcard,
        "window_rank": window_rank,
    }


def _spill_bytes(spark) -> tuple[int, int]:
    """Sum memory/disk spill over all completed stages via the local REST
    status API (the listener-backed numbers the UI shows)."""
    base = spark.sparkContext.uiWebUrl
    if not base:
        return (-1, -1)
    try:
        apps = json.load(urllib.request.urlopen(f"{base}/api/v1/applications"))
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/stages")
        )
        mem = sum(s.get("memoryBytesSpilled", 0) for s in stages)
        disk = sum(s.get("diskBytesSpilled", 0) for s in stages)
        return (mem, disk)
    except Exception:
        return (-1, -1)


def _child(args) -> None:
    """Fresh-JVM cell runner: pins driver memory (local mode: THE heap),
    runs one shape — a generic memory-hungry skeleton, or (``--registry``)
    a REGISTERED engine operator against a hybrid staging dir — to a noop
    sink, prints one JSON result line."""
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName(f"pressure_{args.shape}_{args.heap}")
        .master(f"local[{args.cpus}]")
        .config("spark.driver.memory", args.heap)
        .config("spark.sql.shuffle.partitions", str(args.shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if args.registry:
        import __spark_entry__ as entry_mod

        qfn = entry_mod.queries()[args.shape]
        build = lambda: qfn(spark, args.dir)  # noqa: E731
    else:
        build = _mem_queries(spark, args.dir)[args.shape]
    # warm once (scan cache, codegen), then measure. The spill counters are
    # application-cumulative, so snapshot after the warm run and report the
    # DELTA — otherwise the warm run's spill double-counts into the timed
    # run's numbers (round-9 review finding 5).
    build().write.format("noop").mode("overwrite").save()
    # Evict engine-tracked cached frames between the warm and timed runs:
    # Spark's CacheManager matches the SECOND build's identical analyzed
    # plans to the warm run's persisted frames, so a tracked_cache-using
    # operator would otherwise skip its expensive stages entirely in the
    # timed run (llm_dedup_clusters read 3.3 s for 625k docs — the LSH was
    # never re-run). Same per-rep discipline as bench.py; no-op for
    # operators that cache nothing (r10, found extending the probe to the
    # LLM family).
    from iot_data_pipeline_spark.cache_tracker import evict_tracked

    evict_tracked()
    mem0, disk0 = _spill_bytes(spark)
    t0 = time.monotonic()
    build().write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0
    mem1, disk1 = _spill_bytes(spark)
    mem = mem1 - mem0 if mem0 >= 0 and mem1 >= 0 else -1
    disk = disk1 - disk0 if disk0 >= 0 and disk1 >= 0 else -1
    print(
        "RESULT " + json.dumps(
            {
                "shape": args.shape,
                "heap": args.heap,
                "shuffle": args.shuffle,
                "ok": True,
                "wall_s": round(wall, 2),
                "spill_mem_mb": round(mem / 1e6, 1),
                "spill_disk_mb": round(disk / 1e6, 1),
            }
        ),
        flush=True,
    )
    spark.stop()


def _run_cell(
    cmd: list[str], timeout: int = 1200
) -> subprocess.CompletedProcess:
    """subprocess.run with whole-process-GROUP kill on timeout. The child
    launches a py4j JVM; plain ``subprocess.run(timeout=...)`` kills only
    the Python child, leaving the JVM as an orphan still holding heap,
    ports, and shuffle dirs — which skews the memory measurements of every
    subsequent sweep cell (r9 ADVICE). start_new_session makes the child a
    process-group leader so the timeout path can ``killpg`` the JVM too."""
    with subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=REPO, start_new_session=True,
    ) as p:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            import signal

            try:
                os.killpg(p.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            p.wait()
            raise
        return subprocess.CompletedProcess(cmd, p.returncode, out, err)


def _hybrid_dir(copies: int) -> str:
    """Staging dir for registered-operator cells: the 125x uniform
    events/orders/customer plus symlinks to the sf0.1 originals for every
    other table, so ANY registry id can run with the big-3 facts scaled."""
    import tools_skew_probe as skew

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    big = os.path.join(skew.base_dir(copies), "uniform")
    hybrid = os.path.join(skew.base_dir(copies), "hybrid")
    os.makedirs(hybrid, exist_ok=True)
    for name in os.listdir(sf_dir):
        if not name.endswith(".parquet"):
            continue
        dst = os.path.join(hybrid, name)
        src = os.path.join(big, name)
        if not os.path.exists(src):
            src = os.path.join(sf_dir, name)
        if os.path.islink(dst) or os.path.exists(dst):
            os.remove(dst)
        os.symlink(src, dst)
    return hybrid


def _src_key(sf_dir: str, *replicated: str, scheme: str = "") -> str:
    """Cache key for a staged-by-existence hybrid dir: realpath of the
    source corpus PLUS a content fingerprint (size + mtime_ns) of every
    source table the staging REPLICATES (rather than symlinks). Path alone
    only covers re-pointing SPARK_GRAFT_SF_DIR; regenerating testdata IN
    PLACE would silently reuse replicated tables staged from the old
    corpus while every other table re-symlinks to the new one — a mixed
    hybrid measuring nothing real (r10 ADVICE). Symlinked tables need no
    fingerprint: they always resolve to the current source."""
    import hashlib

    parts = [os.path.realpath(sf_dir), scheme]
    for name in replicated:
        path = os.path.join(sf_dir, name)
        try:
            st = os.stat(path)
            parts.append(f"{name}:{st.st_size}:{st.st_mtime_ns}")
        except OSError:
            parts.append(f"{name}:absent")
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:10]


def _llm_hybrid_dir(copies: int) -> str:
    """Staging dir for LLM/multimodal registered-operator cells (r9 verdict
    item 5): ``documents`` replicated ``copies``x with COPY-DISJOINT token
    prefixes — every token after the first in copy i>0 becomes ``c<i>_<tok>``,
    so shingle sets across copies are disjoint and the corpus's near-dup
    DENSITY stays at the sf0.1 rate (cluster count scales linearly, cluster
    sizes don't). Verbatim replication would instead make every doc a member
    of a 125-clique and the LSH candidate count quadratic in copies — a
    different (unrealistic) corpus, not a bigger one. The prefix carries a
    ``_`` separator (``c<i>_<tok>``) so copy 1's ``c1_0foo`` can never
    collide with copy 10's ``c10_foo`` on digit-leading tokens (r10
    review); the density claim is approximate, not exact — prefixed tokens
    grow by 3-5 chars, so a doc sitting ON a length/alpha filter boundary
    can qualify differently per copy. ``supplier`` (the
    media-file listing driver for scan_binary_files) scales capped at 25x:
    its axis is the file LISTING, staged one-file-per-key driver-side, and
    the files probe already measures the listing shape structurally.

    The staged-by-existence shortcut is keyed on (copies, uid, scheme
    version, and ``_src_key`` = source path + content fingerprint of the
    replicated tables): path alone only covered re-pointing
    SPARK_GRAFT_SF_DIR — regenerating testdata IN PLACE would silently
    reuse documents staged from the OLD corpus while every other table
    re-symlinks to the new one (r10 review + r10 ADVICE)."""
    import duckdb

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    src_key = _src_key(
        sf_dir, "documents.parquet", "supplier.parquet", scheme="scheme_v2"
    )
    base = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_llm_hybrid_{copies}x_{os.getuid()}_{src_key}",
    )
    os.makedirs(base, exist_ok=True)
    docs = os.path.join(base, "documents.parquet")
    if not os.path.exists(docs):
        duckdb.sql(
            f"""COPY (
              SELECT d.doc_id + i * 1000000 AS doc_id,
                     CASE WHEN i = 0 THEN d.text
                          ELSE replace(d.text, ' ', ' c' || i || '_') END AS text,
                     d.lang, d.source,
                     length(CASE WHEN i = 0 THEN d.text
                            ELSE replace(d.text, ' ', ' c' || i || '_') END
                     ) AS n_chars
              FROM '{sf_dir}/documents.parquet' d, range({copies}) t(i)
            ) TO '{docs}' (FORMAT parquet)"""
        )
    sup = os.path.join(base, "supplier.parquet")
    sup_copies = min(copies, 25)
    if not os.path.exists(sup):
        duckdb.sql(
            f"""COPY (
              SELECT s.s_suppkey + i * 1000000 AS s_suppkey, s.s_name,
                     s.s_nationkey, s.s_acctbal
              FROM '{sf_dir}/supplier.parquet' s, range({sup_copies}) t(i)
            ) TO '{sup}' (FORMAT parquet)"""
        )
    for name in os.listdir(sf_dir):
        if not name.endswith(".parquet") or name in (
            "documents.parquet", "supplier.parquet",
        ):
            continue
        dst = os.path.join(base, name)
        if os.path.islink(dst) or os.path.exists(dst):
            os.remove(dst)
        os.symlink(os.path.join(sf_dir, name), dst)
    return base


def _emb_hybrid_dir(copies: int) -> str:
    """Staging dir for the embedding-dedup pressure cells (r14 — the
    hot-cluster guard): ``embeddings`` replicated ``copies``x with
    copy-shifted vec_ids and RELABELED so ONE degenerate cluster holds 20%
    of ALL vectors (label 999 — the skewed k-means cell / default-label
    shape) while the rest scatter across ~500 small labels. This is the
    exact adversarial input for llm_dedup_embed/llm_semdedup: without the
    block decomposition the hot cell's |cell|² cross product lands in one
    join task. Every other table symlinks to the source corpus; dir keyed
    by (copies, uid, _src_key) like the other stagings."""
    import duckdb

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    src_key = _src_key(sf_dir, "embeddings.parquet", scheme="emb_v1")
    base = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_emb_hybrid_{copies}x_{os.getuid()}_{src_key}",
    )
    os.makedirs(base, exist_ok=True)
    emb = os.path.join(base, "embeddings.parquet")
    if not os.path.exists(emb):
        duckdb.sql(
            f"""COPY (
              SELECT v.vec_id + i * 1000000 AS vec_id, v.embedding,
                     CASE WHEN (v.vec_id * 131 + i * 17) % 5 = 0 THEN 999
                          ELSE CAST(v.label * 50 + i % 50 AS INTEGER)
                     END AS label
              FROM '{sf_dir}/embeddings.parquet' v, range({copies}) t(i)
            ) TO '{emb}' (FORMAT parquet)"""
        )
    for name in os.listdir(sf_dir):
        if not name.endswith(".parquet") or name == "embeddings.parquet":
            continue
        dst = os.path.join(base, name)
        if os.path.islink(dst) or os.path.exists(dst):
            os.remove(dst)
        os.symlink(os.path.join(sf_dir, name), dst)
    return base


def _tpch_hybrid_dir(copies: int) -> str:
    """Staging dir for the TPC-H subquery-decorrelation plans under
    pressure (q18's IN-over-HAVING, q21's stacked semi+anti, q5/q9's wide
    snowflakes): ``lineitem`` replicated ``copies``x with ``l_orderkey``
    shifted by the SAME per-copy stride as the skew staging's orders, so
    fact-fact joins stay key-consistent and every copy is a disjoint
    order space; part/supp keys unshifted (dims stay sf0.1, join fan-out
    scales linearly). events/orders/customer come from the skew 'uniform'
    staging; every other table symlinks to the source corpus. Dir keyed by
    (copies, uid, ``_src_key``) like the LLM staging — the content
    fingerprint covers the replicated ``lineitem`` so in-place testdata
    regeneration restages instead of mixing corpora (r10 ADVICE)."""
    import duckdb

    import tools_skew_probe as skew

    skew.stage(copies)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    big = os.path.join(skew.base_dir(copies), "uniform")
    src_key = _src_key(sf_dir, "lineitem.parquet")
    base = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_tpch_hybrid_{copies}x_{os.getuid()}_{src_key}",
    )
    os.makedirs(base, exist_ok=True)
    li = os.path.join(base, "lineitem.parquet")
    if not os.path.exists(li):
        duckdb.sql(
            f"""COPY (
              SELECT l.l_orderkey + i * {skew.ROW_STRIDE} AS l_orderkey,
                     l.l_partkey, l.l_suppkey, l.l_linenumber, l.l_quantity,
                     l.l_extendedprice, l.l_discount, l.l_tax,
                     l.l_returnflag, l.l_linestatus, l.l_shipdate
              FROM '{sf_dir}/lineitem.parquet' l, range({copies}) t(i)
            ) TO '{li}' (FORMAT parquet)"""
        )
    for name in os.listdir(sf_dir):
        if not name.endswith(".parquet") or name == "lineitem.parquet":
            continue
        dst = os.path.join(base, name)
        src = os.path.join(big, name)
        if not os.path.exists(src):
            src = os.path.join(sf_dir, name)
        if os.path.islink(dst) or os.path.exists(dst):
            os.remove(dst)
        os.symlink(src, dst)
    return base


def mem_probe(args) -> None:
    import tools_skew_probe as skew

    if args.registry and args.tpch:
        d = _tpch_hybrid_dir(args.copies)
    elif args.registry and args.emb:
        d = _emb_hybrid_dir(args.copies)
    elif args.registry and args.llm:
        d = _llm_hybrid_dir(args.copies)
    elif args.registry:
        if not args.skip_stage:
            skew.stage(args.copies)
        d = _hybrid_dir(args.copies)
    else:
        if not args.skip_stage:
            skew.stage(args.copies)
        d = os.path.join(skew.base_dir(args.copies), "uniform")
    if args.registry:
        global SHAPES
        SHAPES = tuple(s for s in args.registry.split(",") if s)
    rows = []
    for heap in args.heaps.split(","):
        for cpus in (int(c) for c in args.cpus_list.split(",")):
            for shuffle in (int(s) for s in args.shuffles.split(",")):
                for shape in SHAPES:
                    cmd = [
                        sys.executable, os.path.abspath(__file__), "mem",
                        "--child", "--shape", shape, "--heap", heap,
                        "--shuffle", str(shuffle), "--dir", d,
                        "--cpus", str(cpus),
                    ]
                    if args.registry:
                        cmd += ["--registry", args.registry]
                    try:
                        proc = _run_cell(cmd, args.cell_timeout)
                    except subprocess.TimeoutExpired:
                        # A GC-thrashing child that never dies cleanly is
                        # exactly the regime this probe exercises — record
                        # the hang as a failed cell and keep sweeping
                        # (round-9 review finding 3). _run_cell killed the
                        # child's whole process group, so the py4j JVM
                        # cannot linger into the next cell (r9 ADVICE).
                        res = {
                            "shape": shape, "heap": heap, "shuffle": shuffle,
                            "cpus": cpus, "ok": False, "timeout": True,
                            "oom": False,
                        }
                        rows.append(res)
                        print(json.dumps(res), flush=True)
                        continue
                    res = None
                    for line in proc.stdout.splitlines():
                        if line.startswith("RESULT "):
                            res = json.loads(line[len("RESULT "):])
                    if res is None:
                        full = (proc.stderr or "") + (proc.stdout or "")
                        res = {
                            "shape": shape, "heap": heap, "shuffle": shuffle,
                            "cpus": cpus, "ok": False, "rc": proc.returncode,
                            # a kernel-OOM-killed JVM dies on SIGKILL with
                            # no Java stack trace — classify it as OOM too
                            # (round-9 review finding 4)
                            "oom": "OutOfMemoryError" in full
                            or proc.returncode in (-9, 137)
                            or "Killed" in full,
                        }
                    else:
                        res["cpus"] = cpus
                    rows.append(res)
                    print(json.dumps(res), flush=True)
    print(
        "\n| shape | heap | slots | shuffle | ok | wall s "
        "| spill mem MB | spill disk MB |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        outcome = (
            "ok" if r["ok"]
            else "OOM" if r.get("oom")
            else "timeout" if r.get("timeout")
            else "fail"
        )
        print(
            f"| {r['shape']} | {r['heap']} | {r['cpus']} | {r['shuffle']} "
            f"| {outcome} | {r.get('wall_s', '-')} "
            f"| {r.get('spill_mem_mb', '-')} | {r.get('spill_disk_mb', '-')} |"
        )


def files_probe(args) -> None:
    import duckdb

    from iot_data_pipeline_spark.operators._util import per_user_tmp_suffix
    from iot_data_pipeline_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_files_{per_user_tmp_suffix()}"
    )
    os.makedirs(root, exist_ok=True)
    staged = os.path.join(root, f"events_{args.copies}x.parquet")
    duckdb.sql(
        f"""COPY (SELECT e.event_id + i*10000000 AS event_id, e.ts,
                   e.user_id + i*100000 AS user_id, e.event_type, e.value
            FROM '{sf_dir}/events.parquet' e, range({args.copies}) t(i))
            TO '{staged}' (FORMAT parquet)"""
    )
    spark = build_session("files_probe", master=f"local[{args.cpus}]",
                          shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    frag = os.path.join(root, "fragmented")
    ev = spark.read.parquet(staged)
    n_rows = ev.count()
    ev.repartition(args.nfiles).write.mode("overwrite").parquet(frag)
    n_files = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
    compacted = os.path.join(root, "compact")

    def scan_agg(path):
        df = spark.read.parquet(path)
        return df.groupBy("event_type").agg({"value": "sum", "*": "count"})

    def run(label, path, conf):
        for k, v in conf.items():
            spark.conf.set(k, v)
        try:
            df = spark.read.parquet(path)
            n_tasks = df.rdd.getNumPartitions()
            scan_agg(path).write.format("noop").mode("overwrite").save()  # warm
            t0 = time.monotonic()
            scan_agg(path).write.format("noop").mode("overwrite").save()
            wall = time.monotonic() - t0
        finally:
            for k in conf:
                spark.conf.unset(k)
        res = {"case": label, "scan_tasks": n_tasks, "wall_s": round(wall, 2)}
        print(json.dumps(res), flush=True)
        return res

    rows = [
        run("packed_default", frag, {}),
        # defeat packing: openCost as large as maxPartitionBytes means no
        # second file ever fits in a partition, while maxPartitionBytes
        # stays above the ~12 KB file size so files aren't range-split ->
        # exactly one task per file, the pathological listing
        run(
            "per_file_tasks", frag,
            {"spark.sql.files.maxPartitionBytes": "24k",
             "spark.sql.files.openCostInBytes": "24k"},
        ),
    ]
    spark.read.parquet(frag).coalesce(args.cpus).write.mode(
        "overwrite"
    ).parquet(compacted)
    rows.append(run("after_compaction", compacted, {}))
    back = spark.read.parquet(compacted).count()
    assert back == n_rows, (back, n_rows)
    print(f"\nrows={n_rows}, fragmented files={n_files}")
    print("| case | scan tasks | wall s |")
    print("|---|---|---|")
    for r in rows:
        print(f"| {r['case']} | {r['scan_tasks']} | {r['wall_s']} |")
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("probe", choices=["mem", "files"])
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--shape")
    ap.add_argument(
        "--registry", default="",
        help="mem probe: comma-separated REGISTERED query ids to run under "
        "pressure against the hybrid staging dir (125x events/orders/"
        "customer + sf0.1 for the rest) instead of the generic shapes",
    )
    ap.add_argument("--heap", default="1g")
    ap.add_argument("--heaps", default="1g,16g")
    ap.add_argument("--shuffle", type=int, default=32)
    ap.add_argument("--shuffles", default="32,256")
    ap.add_argument(
        "--cpus-list", default="32,4", dest="cpus_list",
        help="mem probe: task-slot counts per fresh JVM — heap/slots is the "
        "per-task memory floor, the executor cores-per-GB sizing knob",
    )
    ap.add_argument(
        "--llm", action="store_true",
        help="mem probe with --registry: stage the LLM/multimodal hybrid "
        "(documents replicated with copy-disjoint tokens, supplier capped "
        "at 25x) instead of the events/orders/customer hybrid",
    )
    ap.add_argument(
        "--emb", action="store_true",
        help="mem probe with --registry: stage the embedding hybrid "
        "(embeddings replicated with one hot cluster holding 20%% of "
        "vectors) for the dedup-embed hot-cluster guard cells",
    )
    ap.add_argument(
        "--tpch", action="store_true",
        help="mem probe with --registry: stage the TPC-H hybrid (lineitem "
        "replicated with order keys matching the scaled orders) for the "
        "subquery-decorrelation plans",
    )
    ap.add_argument(
        "--cell-timeout", type=int, default=1200, dest="cell_timeout",
        help="per-cell subprocess timeout in seconds (CPU-bound decode "
        "cells at 125x need more than the default at starved profiles)",
    )
    ap.add_argument("--dir")
    ap.add_argument("--copies", type=int, default=None)
    ap.add_argument("--nfiles", type=int, default=4096)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--skip-stage", action="store_true")
    args = ap.parse_args()
    if (args.llm or args.tpch or args.emb) and not args.registry:
        # --llm/--tpch only select the staging for REGISTRY cells;
        # accepting them alone would silently sweep the generic skew
        # shapes while the operator believes the named family ran
        # (r10 review).
        ap.error("--llm/--tpch/--emb require --registry <ids>")
    if sum((args.llm, args.tpch, args.emb)) > 1:
        ap.error("--llm/--tpch/--emb are mutually exclusive")
    if args.probe == "mem":
        if args.copies is None:
            args.copies = 125
        if args.child:
            _child(args)
        else:
            mem_probe(args)
    else:
        if args.copies is None:
            args.copies = 25
        files_probe(args)


if __name__ == "__main__":
    main()
