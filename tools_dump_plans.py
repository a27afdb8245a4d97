"""Regenerate PLANS.md: physical plans of flagship queries with scale notes.

Run after any plan-affecting change: ``python tools_dump_plans.py``.
"""

from __future__ import annotations

PICKS = {
    "join_multiway": (
        "5-way star join: dimensions broadcast, facts hash-joined,"
        " decimal-exact agg"
    ),
    "filter_pred": (
        "compound predicate fully pushed to the parquet scan, columns pruned"
    ),
    "join_asof_event": (
        "as-of join as union-and-scan: exactly ONE exchange (window shuffle)"
    ),
    "sort_limit": (
        "global ORDER BY LIMIT as TakeOrderedAndProject (no total sort)"
    ),
    "agg_groupby_label": (
        "partial+final hash aggregation, shuffle carries only group rows"
    ),
    "join_theta_range": (
        "banded bucket join: equi-hash on (brand, floor(price/band)) with"
        " ±1-bucket explode probes; residual only on bucket-local pairs"
    ),
    "llm_dedup_near": (
        "MinHash+LSH: narrow signature pass, single bucket equi-join"
    ),
    "sink_parquet_partitioned": (
        "partition-pruned read after Hive-partitioned write"
    ),
    "evt_funnel": (
        "funnel in ONE shuffle: unordered window on user_id computes"
        " signup_ts; groupBy(user_id, signup_ts) reuses the partitioning"
        " (no second Exchange)"
    ),
    "llm_corpus_pipeline": (
        "capstone: quality filter + exact dedup fused into the scan side;"
        " near-dup stage is the banded MinHash/LSH candidate join"
        " (xxhash64 band buckets), never an all-pairs shingle self-join"
    ),
    "sql_entry_tpch_q18": (
        "IN-over-HAVING decorrelated: lineitem aggregated once, keys semi-"
        "filter orders, top-100 is TakeOrderedAndProject"
    ),
    "sql_entry_tpch_q21": (
        "stacked EXISTS/NOT EXISTS as semi + anti hash joins on l_orderkey,"
        " inequalities as residuals (no nested loop)"
    ),
    "evt_latest_snapshot": (
        "latest-per-key via max_by: map-side partial agg, shuffle carries"
        " one row per (partition, user)"
    ),
    "llm_corpus_to_sequences": (
        "second capstone: filter+dedup prune before the packing window;"
        " final agg reuses the window's (lang, shard) partitioning —"
        " langs × 16 parallel sorts, no single-language sort task"
    ),
    "evt_active_windows": (
        "sweep-line: two per-day partial aggs, prefix sum only over the"
        " bounded calendar spine"
    ),
    "win_ntile_dist": (
        "distributed global rank: range repartition + per-partition"
        " row_number + broadcast offset join — no single-task global window"
    ),
    "iot_interpolate": (
        "pair expansion: one lead() window over OBSERVED readings, missing"
        " cells exploded narrowly after the window — the dense device×hour"
        " grid, its join, and the grid-wide carry sorts never exist"
    ),
    "graph_pagerank": (
        "iterative: degree folded into the cached src-partitioned edge"
        " list once; each iteration is one shuffle join + partial/final"
        " sum on LONG node keys (strings only in the final projection)"
    ),
    "sql_entry_tpch_q5": (
        "6-way snowflake: dim chain broadcasts, the one big shuffle pair is"
        " orders⋈lineitem on orderkey; year filter pushed to the orders scan"
    ),
    "sql_entry_tpch_q19": (
        "OR-of-ANDs across both join sides stays an equi hash join;"
        " per-side disjunctions derived and pushed to each parquet scan"
    ),
    "join_bucketed_colocated": (
        "pre-bucketed co-located join: Bucketed: true on both scans, zero"
        " Exchange into the SortMergeJoin; only the tiny per-status agg"
        " shuffles"
    ),
    "llm_unigram_rarity": (
        "two-pass corpus-frequency scoring: vocab count shuffles |vocab|"
        " partials, then broadcasts back to the token stream (BHJ — the"
        " Zipf-skewed key never re-shuffles the corpus)"
    ),
    "sql_entry_tpch_q9": (
        "derived-partsupp profit join: partsupp is a linear broadcast-"
        "crossed map over part (1-row count + 4-row stripe spine); the"
        " fact joins the two-column-keyed dimension with hash joins only,"
        " %red% pushed to the part scan as Contains"
    ),
    "scan_binary_files": (
        "binaryFile media ingest: glob-filtered recursive listing packs"
        " small files per task by openCostInBytes; filename key parsed"
        " JVM-side; real PPM decode in one Arrow-batched mapInPandas —"
        " shuffle-free"
    ),
    "llm_sim_pq": (
        "IVF+PQ: probed rows encoded to M codes and ADC-scored from"
        " broadcast lookup tables (batch-local top-k), global candidate"
        " window, exact-cosine re-rank via broadcast joins — vectors never"
        " shuffle"
    ),
    "join_interval_overlap": (
        "calendar-grid interval overlap: each window explodes into its"
        " <=2 covered months, equi-hash join on (custkey, cell), once-only"
        " emission at the later start's month — no dedup shuffle, no"
        " nested loop"
    ),
    "scan_binary_partitioned": (
        "hive-partitioned binaryFile scan: shard=N directories become a"
        " partition column and the shard predicate prunes the listing at"
        " plan time (PartitionFilters), decode only on surviving files"
    ),
    "join_bloom_prefilter": (
        "runtime Bloom prefilter: NDV-auto-sized bitset (16 KB floor; plan"
        " literal + getbit codegen to 256 KB, Arrow broadcast-variable tier"
        " to 128 MB, fold collected as 16 KB chunk blobs assembled linearly)"
        " from the selective build side; the Filter sits on the"
        " probe scan BELOW the join and cuts ~92% of the big side before"
        " the exchange — no false negatives, oracle is the plain join"
    ),
    "join_dpp_partitioned": (
        "dynamic partition pruning: the era-filtered broadcast dim injects"
        " its surviving years into the fact scan's PartitionFilters at"
        " runtime (dynamicpruningexpression) — other years' partitions are"
        " never listed or read"
    ),
    "sink_zorder_layout": (
        "Morton-key clustered write: range-exchange + in-partition sort on"
        " the interleaved (custkey, day) key gives every file a 2-D"
        " bounding box; box read-back skips files from footer stats on"
        " either dimension"
    ),
    "llm_quality_classifier": (
        "trainable NB quality filter (r12): token frame DISK-cached and"
        " consumed by BOTH the training count aggregation and the scoring"
        " join (one corpus explode); weight join carries no broadcast hint"
        " — AQE picks broadcast while the vocab is small, shuffle at 1e8"
        " tokens; 1-row stats frames broadcast-crossed; per-doc score is"
        " an exact BIGINT sum (no float fold)"
    ),
    "llm_lm_perplexity": (
        "bigram LM scorer (r12, tercile distributed r13): pairs built per"
        " doc by zip_with over two slices of a BOUND array column — never"
        " element_at(split(...), i) inside the lambda, which defeats CSE"
        " and re-splits per element (O(tokens²); measured 90 s of a 111 s"
        " wall at 125x before the fix); counts map-side combined; integer"
        " per-doc sums; the tercile is now the two-pass distributed rank"
        " (range repartition -> per-partition row_number -> broadcast"
        " prefix sums) — the only SinglePartition exchanges left feed the"
        " <=numPartitions-row offsets window and scalar aggregates, never"
        " the per-document frame (VERDICT r12 item 1)"
    ),
    "llm_dsir_select": (
        "DSIR importance-ratio selection (r13): one DISK-cached corpus"
        " explode shared by the count and scoring passes; target/raw"
        " bigram masses from ONE pass over the count table; per-bigram"
        " 1e-6-integer log ratios joined back as a plain equi-join (AQE"
        " broadcast while small); top-quartile selection via the same"
        " two-pass distributed rank — no single-task sort over the"
        " per-document frame"
    ),
    "acid_cdf_journal": (
        "write-time CDC feed (r13): the returned plan is a pure union of"
        " journal-sliver and appended-file scans tagged per commit — no"
        " join, no key-uniqueness requirement, no table scan; delete/merge"
        " paid the journal at write time (one extra write of the changed"
        " sliver)"
    ),
    "llm_semdedup": (
        "per-vector SemDeDup verdict (r13): bucketed same-label cosine"
        " pair join (never all-pairs across clusters; labels over the"
        " 2048 cap block-decompose into bounded BLAS cells, r14) -> one"
        " count aggregation -> left join onto the vector spine"
    ),
    "acid_deletion_vectors": (
        "merge-on-read DV snapshot (r14): plain scans for vector-free"
        " files unioned with a LEFT ANTI join of the dv-carrying files'"
        " scan (metadata row_index/file identity, evaluated at the scan)"
        " against the deleted-position sliver — AQE broadcasts the sliver;"
        " data files byte-untouched, predicate pushdown below the join"
    ),
    "acid_restore": (
        "RESTORE read (r14): the rewound snapshot is a plain scan of the"
        " RE-REFERENCED original files — restore wrote only a ~1 KB"
        " manifest (metadata-only commit), so the plan is identical to"
        " reading version 0 directly"
    ),
    "acid_zorder_compact": (
        "Z-order OPTIMIZE read (r14): 2-D box skip_where prunes files"
        " from manifest stats BEFORE Spark lists them; the rewrite was one"
        " range-exchange on the Morton key of range-normalized 16-bit"
        " cells (bounds from manifest stats — no extra scan)"
    ),
}


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as em

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    sf = "/root/testdata/sf0.01"
    out = [
        "# PLANS — physical plans of flagship queries (sf0.01, local[8])",
        "",
        "Generated by `python tools_dump_plans.py`; regenerate after",
        "plan-affecting changes. Each plan is the pre-execution AQE plan"
        " (`isFinalPlan=false`);",
        "AQE may further coalesce partitions / switch join strategies at"
        " runtime.",
        "",
    ]
    for name, note in PICKS.items():
        plan = (
            qs[name](spark, sf)._jdf.queryExecution().executedPlan().toString()
        )
        lines = [line[:200] for line in plan.splitlines()]
        # Iterative plans (pagerank) repeat the same per-iteration subtree;
        # keep the doc reviewable by truncating past the structure.
        if len(lines) > 120:
            lines = lines[:120] + [
                f"... ({len(lines) - 120} more lines; iterations repeat the"
                " subtree above)"
            ]
        out.append(f"## {name}\n\n{note}\n\n```\n" + "\n".join(lines) + "\n```\n")
    with open("PLANS.md", "w") as fh:
        fh.write("\n".join(out))
    spark.stop()


if __name__ == "__main__":
    main()
