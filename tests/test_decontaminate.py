"""Decontamination: exact result (filter is a pure physical
optimization), min_hits thresholding, and the prune actually pruning."""

from pyspark.sql import functions as F

from prefix_filter_spark.operators.decontaminate import contaminated_docs


def _corpus(spark):
    # benchmark doc 0 contains "alpha beta gamma delta"; docs 1-2 share
    # n-grams with it at different depths; 3+ share nothing
    rows = [
        (0, "alpha beta gamma delta epsilon"),
        (1, "zz alpha beta gamma delta yy"),       # 2 shared 3-grams
        (2, "qq ww alpha beta gamma rr"),          # 1 shared 3-gram
        (3, "totally unrelated text about spark"),
        (4, "another clean document entirely here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_counts_and_threshold(spark):
    docs = _corpus(spark)
    bench = docs.where("doc_id = 0")
    corpus = docs.where("doc_id > 0")
    got = {
        r["doc_id"]: r["n_shared"]
        for r in contaminated_docs(spark, corpus, bench, n=3, min_hits=1).collect()
    }
    assert got == {1: 2, 2: 1}
    strict = {
        r["doc_id"]: r["n_shared"]
        for r in contaminated_docs(spark, corpus, bench, n=3, min_hits=2).collect()
    }
    assert strict == {1: 2}


def test_matches_exact_join_on_synthetic(spark, documents_med):
    """Filter-pruned pipeline == plain exact intersection on real
    testdata (the filter's false positives must all die in the verify,
    zero-FN means nothing is lost)."""
    from prefix_filter_spark.operators.dedup import shingles

    bench = documents_med.where(F.col("doc_id") % 17 == 0)
    corpus = documents_med.where(F.col("doc_id") % 17 != 0)
    got = contaminated_docs(spark, corpus, bench, n=3, min_hits=1)
    sh = shingles(corpus, 3)
    bs = shingles(bench, 3).select("s").distinct()
    want = (
        sh.join(bs, "s", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    g = {(r["doc_id"], r["n_shared"]) for r in got.collect()}
    w = {(r["doc_id"], r["n_shared"]) for r in want.collect()}
    assert g == w and len(g) > 0


def test_xor_kind_matches_bloom_kind(spark, documents_med):
    """The static xor runtime filter must produce the same EXACT result
    as the bloom kind (both are pure physical prunes before the exact
    verify)."""
    from pyspark.sql import functions as F

    from prefix_filter_spark.operators.decontaminate import contaminated_docs

    corpus = documents_med
    bench = documents_med.where(F.col("doc_id") % 7 == 0).select("doc_id", "text")
    a = {
        (r["doc_id"], r["n_shared"])
        for r in contaminated_docs(spark, corpus, bench, kind="bloom").collect()
    }
    b = {
        (r["doc_id"], r["n_shared"])
        for r in contaminated_docs(spark, corpus, bench, kind="xor").collect()
    }
    assert a == b and a
