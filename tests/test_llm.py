"""LLM-operator behavior pins: LSH recall vs exact, simhash locality,
dedup idempotence, ANN recall floor."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from iot_data_pipeline_spark.operators import llm


def _pairs(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def test_minhash_matches_exact_ngram(spark, sf_dir):
    """On this corpus the MinHash+LSH candidates, after exact verification,
    must equal the exact n-gram jaccard pairs (LSH only risks recall loss;
    verification removes precision loss)."""
    exact = _pairs(llm.llm_dedup_ngram(spark, sf_dir))
    approx = _pairs(llm.llm_dedup_near(spark, sf_dir))
    assert approx.issubset(exact)
    # recall on near-identical docs should be high
    assert len(approx) >= 0.8 * len(exact)


def test_dedup_exact_idempotent(spark, sf_dir):
    once = llm.llm_dedup_exact(spark, sf_dir)
    ids = [r["doc_id"] for r in once.select("doc_id").collect()]
    assert len(ids) == len(set(ids))
    # property: dedup over already-unique keys keeps everything
    from iot_data_pipeline_spark.operators._util import table

    docs = table(spark, sf_dir, "documents")
    kept = once.count()
    distinct_texts = docs.select(F.lower(F.trim("text"))).distinct().count()
    assert kept == distinct_texts


def test_simhash_locality(spark):
    """Near-identical texts hash within small Hamming distance; unrelated
    texts don't."""
    import tempfile

    base = "the quick brown fox jumps over the lazy dog " * 10
    variant = base.replace("lazy", "sleepy", 1)
    other = "completely different content about spark engines " * 10
    df = spark.createDataFrame(
        [Row(doc_id=1, text=base), Row(doc_id=2, text=variant), Row(doc_id=3, text=other)]
    )
    tmp = tempfile.mkdtemp(prefix="simhash_t_")
    df.write.mode("overwrite").parquet(tmp + "/documents.parquet")
    out = {r["doc_id"]: r["simhash"] for r in llm.llm_dedup_simhash(spark, tmp).collect()}

    def hamming(a, b):
        return bin((a & 0xFFFFFFFFFFFFFFFF) ^ (b & 0xFFFFFFFFFFFFFFFF)).count("1")

    assert hamming(out[1], out[2]) <= 8
    assert hamming(out[1], out[3]) > 16


def test_ann_recall_floor(spark, sf_dir):
    exact = llm.llm_sim_topk(spark, sf_dir)
    ann = llm.llm_sim_ann(spark, sf_dir)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in ann.collect()}
    # bucketed search scores ~1/16 of the corpus; demand nontrivial recall.
    assert len(e & a) / len(e) >= 0.2


def test_dedup_idempotence_property(spark, tmp_path):
    """SURVEY §5.4: dedup(dedup(x)) == dedup(x), on generated corpora with
    forced duplicates."""
    import tempfile

    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])
    doc = st.lists(word, min_size=1, max_size=8).map(" ".join)

    @settings(max_examples=10, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=12))
    def check(texts):
        # duplicate every other doc to guarantee collisions
        corpus = texts + [t.upper() for t in texts[::2]]
        rows = [
            Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
            for i, t in enumerate(corpus)
        ]
        tdir = tempfile.mkdtemp(prefix="dedup_prop_")
        spark.createDataFrame(rows).write.mode("overwrite").parquet(
            tdir + "/documents.parquet"
        )
        once = llm.llm_dedup_exact(spark, tdir)
        kept_ids = sorted(r["doc_id"] for r in once.collect())
        # write the deduped set back out and dedup again
        docs = spark.read.parquet(tdir + "/documents.parquet")
        tdir2 = tempfile.mkdtemp(prefix="dedup_prop2_")
        docs.filter(docs.doc_id.isin(kept_ids)).write.mode("overwrite").parquet(
            tdir2 + "/documents.parquet"
        )
        twice = llm.llm_dedup_exact(spark, tdir2)
        assert sorted(r["doc_id"] for r in twice.collect()) == kept_ids

    check()


def test_similarity_planner_dispatch(spark, sf_dir):
    exact = {tuple(r) for r in llm.llm_sim_topk(spark, sf_dir).collect()}
    # small corpus → auto picks the exact path
    auto = {tuple(r) for r in llm.similarity_search(spark, sf_dir).collect()}
    assert auto == exact
    # forcing the ANN path returns the same schema
    ann = llm.similarity_search(spark, sf_dir, mode="ann")
    assert ann.columns == llm.llm_sim_topk(spark, sf_dir).columns


def test_quality_filter_subset(spark, sf_dir):
    from iot_data_pipeline_spark.operators._util import table

    total = table(spark, sf_dir, "documents").count()
    kept = llm.llm_quality_filter(spark, sf_dir).count()
    assert 0 < kept <= total
