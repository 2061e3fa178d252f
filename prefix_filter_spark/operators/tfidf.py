"""TF-IDF and BM25 document scoring — the retrieval-style relevance
ranking a training-data pipeline uses for quality filtering ("score
every page against a topical query set") and eval-set mining.

Reference scope note: the reference repo (TomerEven/Prefix-Filter) has
no text scoring; this extends the engine's training-pipeline operator
family (SURVEY.md round-4 additions) beside text.py's quality/
repetition signals.

Scale shape, end to end:

- ``doc_freqs``: ONE corpus scan -> explode distinct words per doc ->
  one groupBy(w) shuffle. Output is vocabulary-sized (10^6-10^8 rows
  at web scale), never corpus-sized.
- ``bm25_score`` / ``tfidf_score``: the per-term IDF table is
  restricted to the QUERY's terms (a handful of rows) and folded into
  a literal map, so scoring is a MAP-ONLY pass over the corpus — no
  join, no shuffle, no Python. Per-doc term frequencies come from
  Catalyst array expressions over the words array; the score is one
  ``F.aggregate`` over the fixed, literal term order, making the
  float sum order-deterministic on any partitioning (the same
  determinism rule the repo's gates rely on).
- The one corpus-sized agg (doc_freqs) and the scoring pass compose
  into two jobs; ``avgdl`` and ``N`` ride the same single stats row.

At 100 TB: doc_freqs is a standard word-count-shaped shuffle (AQE
handles skew: stopword rows are heavy but it is a sum, partial
aggregation absorbs them map-side); scoring is embarrassingly
parallel. Multi-thousand-term query sets should swap the literal map
for a broadcast join on an exploded (doc_id, w, tf) relation — the
literal-map path is for the common few-term filter query.

Correctness evidence: test_tfidf.py pins a hand-computed example
exactly and cross-checks the full pipeline against a DuckDB twin at
1e-9 (logs are libm-dependent across engines, so the twin comparison
uses tolerance, not hashes — the same reasoning as the lm_perplexity
gate's fixed-point redesign, documented there).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prefix_filter_spark.sources.tokenizer import words_col


def doc_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, df) — number of DOCUMENTS containing each word. One scan,
    per-doc array_distinct BEFORE the explode (so the shuffle carries
    distinct (doc, word) pairs, not every occurrence), one groupBy."""
    return (
        docs.select(
            F.explode(F.array_distinct(words_col(text_col))).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("df"))
    )


def corpus_stats(docs: DataFrame, text_col: str = "text") -> tuple[int, float]:
    """(N, avgdl): document count and mean document length in words —
    one row to the driver. avgdl is an exact integer token sum divided
    once (not F.avg over doubles, whose accumulation order varies with
    partitioning — the lm_perplexity lesson), so it is a pure function
    of the corpus."""
    r = docs.select(
        F.count("*").alias("n"),
        F.sum(F.size(words_col(text_col))).alias("toks"),
    ).collect()[0]
    if not r["n"] or not r["toks"]:
        raise ValueError("corpus is empty (no documents or no words)")
    return int(r["n"]), int(r["toks"]) / int(r["n"])


def _dfs_for_terms(
    docs: DataFrame, terms: list[str], text_col: str
) -> dict[str, int]:
    """df lookup restricted to the query's terms — a handful of rows
    collected from the vocab-sized doc_freqs relation."""
    return {
        r["w"]: int(r["df"])
        for r in doc_freqs(docs, text_col)
        .where(F.col("w").isin(list(terms)))
        .collect()
    }


def idf_for_terms(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    *,
    n: int | None = None,
) -> dict[str, float]:
    """BM25 idf (Robertson-Sparck Jones with the +1 floor, the Lucene
    form: ln(1 + (N - df + 0.5) / (df + 0.5))) for each query term.
    The df lookup filters the vocab-sized doc_freqs relation to the
    query's terms before collecting — a handful of rows. Pass ``n``
    when the caller already ran corpus_stats (bm25_score does) to skip
    the second count job."""
    if n is None:
        n = docs.count()
    dfs = _dfs_for_terms(docs, terms, text_col)
    return {
        t: math.log(1.0 + (n - dfs.get(t, 0) + 0.5) / (dfs.get(t, 0) + 0.5))
        for t in terms
    }


def _tf_col(ws: Column, term: str) -> Column:
    return F.size(F.filter(ws, lambda x: x == F.lit(term)))


def bm25_score(
    docs: DataFrame,
    terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    out_col: str = "bm25",
) -> DataFrame:
    """Append a BM25 relevance score against ``terms``: sum over query
    terms of idf(t) * tf / (tf + k1 * (1 - b + b * dl/avgdl)).

    Map-only: idf and avgdl are computed once up front (two small
    jobs), then ride the plan as literals; per-term tf is a Catalyst
    array filter; the sum runs in the FIXED order of ``terms`` so the
    double result is identical on any partitioning."""
    if not terms:
        raise ValueError("terms must be non-empty")
    if len(set(terms)) != len(terms):
        raise ValueError("terms must be distinct (duplicates double-count)")
    n, avgdl = corpus_stats(docs, text_col)
    idf = idf_for_terms(docs, terms, text_col, n=n)
    ws = words_col(text_col)
    dl = F.size(ws).cast("double")
    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(avgdl))
    score = F.lit(0.0)
    for t in terms:  # fixed literal order -> deterministic float sum
        tf = _tf_col(ws, t).cast("double")
        score = score + F.lit(idf[t]) * tf / (tf + norm)
    return docs.withColumn(out_col, score)


def tfidf_score(
    docs: DataFrame,
    terms: list[str],
    *,
    text_col: str = "text",
    out_col: str = "tfidf",
) -> DataFrame:
    """Classic lnc.ltc-flavoured TF-IDF sum against ``terms``:
    sum over t of (1 + ln(tf)) * ln(N / df) for tf > 0. Same map-only
    shape and fixed-order determinism as bm25_score."""
    if not terms:
        raise ValueError("terms must be non-empty")
    if len(set(terms)) != len(terms):
        raise ValueError("terms must be distinct (duplicates double-count)")
    n = docs.count()
    if n == 0:
        raise ValueError("corpus is empty")
    dfs = _dfs_for_terms(docs, terms, text_col)
    ws = words_col(text_col)
    score = F.lit(0.0)
    for t in terms:
        df_t = dfs.get(t, 0)
        if df_t == 0:
            continue  # idf undefined; term contributes nothing
        tf = _tf_col(ws, t).cast("double")
        idf_t = math.log(n / df_t)
        score = score + F.when(
            tf > 0, (F.lit(1.0) + F.log(tf)) * F.lit(idf_t)
        ).otherwise(F.lit(0.0))
    return docs.withColumn(out_col, score)
