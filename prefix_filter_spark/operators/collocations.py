"""Pointwise-mutual-information collocations — the classic corpus
analytics for "which word pairs belong together" (Church & Hanks 1990),
used in training-data pipelines for tokenizer vocabulary curation
(multi-word tokens), boilerplate discovery (navigation phrases score
high), and corpus drift dashboards.

Over the bigram stream (lm_score._bigrams — the shared map-side
explode):

    pmi(a, b)  = log2( c(a,b) * N / (c(a,·) * c(·,b)) )
    npmi(a, b) = pmi / -log2(c(a,b) / N)        in (-1, 1]

with N = total bigrams and the marginals taken over the bigram table
(left marginal for a, right for b), so every quantity derives from ONE
corpus aggregation; the two marginal tables are vocab-scale re-aggs of
the (already tiny) bigram-count table. min_count filters the unstable
low-frequency tail (PMI's known pathology: a 1-count pair of two rare
words maxes the score).

Scale shape: one corpus-scale hash aggregation (map-side combined, the
primitive Spark scales), everything after it is vocab-sized; top-k is
a TakeOrdered, not a global sort. Deterministic: counts are exact
integers and the emitted scores are rounded; ties rank by (a, b).

No reference counterpart (the C++ suite is an AMQ library); extends
the text-analytics family (SURVEY §2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prefix_filter_spark.operators.lm_score import _bigrams


def bigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w1, w2, c) — the one corpus-scale aggregation."""
    return (
        _bigrams(docs, text_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c"))
    )


def pmi_collocations(
    docs: DataFrame,
    min_count: int = 5,
    top_k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """-> (w1, w2, c, pmi, npmi) — the ``top_k`` collocations by PMI
    among pairs with count >= ``min_count``, ties broken by (w1, w2)."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    # cache: the total-count collect below is its own job, and without
    # the cache it would re-run the corpus explode+agg that the result
    # plan runs again (same reason train_kn_counts caches its trigrams)
    bg = bigram_counts(docs, text_col).cache()
    left = bg.groupBy("w1").agg(F.sum("c").alias("c1"))
    right = bg.groupBy("w2").agg(F.sum("c").alias("c2"))
    total = bg.agg(F.sum("c")).collect()[0][0]
    if total is None:
        return docs.sparkSession.createDataFrame(
            [], "w1 string, w2 string, c bigint, pmi double, npmi double"
        )
    n = float(total)
    joint = F.col("c").cast("double") / F.lit(n)
    pmi = F.log2(
        F.col("c").cast("double") * F.lit(n)
        / (F.col("c1").cast("double") * F.col("c2").cast("double"))
    )
    # joint == 1 (a corpus that is one repeated bigram): -log2(1) = 0
    # would divide by zero; npmi's limit there is its maximum, 1
    npmi = F.when(joint == 1.0, F.lit(1.0)).otherwise(pmi / -F.log2(joint))
    return (
        bg.where(F.col("c") >= min_count)
        .join(left, "w1")
        .join(right, "w2")
        .select(
            "w1",
            "w2",
            "c",
            F.round(pmi, 6).alias("pmi"),
            F.round(npmi, 6).alias("npmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(top_k)
    )
