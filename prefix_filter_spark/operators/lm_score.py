"""N-gram language-model perplexity scoring — the CCNet-style quality
filter (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data"): score every document by its perplexity
under an n-gram LM trained on a reference corpus, then keep/bucket docs
by score. This is the classic third leg of a training-data pipeline
beside dedup and heuristic quality scores (operators/text.py).

No reference counterpart in /root/reference (the reference is an AMQ
filter library); this family is brief-mandated ("the operations a
large-scale training-data pipeline would need").

Model: bigram LM with add-alpha smoothing over the deterministic word
split shared by every text operator (sources/tokenizer.words_col — the
DuckDB oracles mirror it 1:1):

    p(w | u) = (c(u, w) + alpha) / (c(u) + alpha * V)

score(doc) = -mean(log2 p) over the doc's bigram stream;
perplexity(doc) = 2^score. Everything is exact double arithmetic over
integer counts — DuckDB reproduces it bit-for-bit, so the gate is a
hash-matched oracle, not a bound.

Scale shape (100 TB corpus, bounded reference):
- training = two groupBy counts over the REFERENCE corpus (one shuffle
  each); reference corpora are curated and small relative to the corpus
  being scored (CCNet uses Wikipedia), so count tables are of vocab
  size, not corpus size.
- scoring = map-side bigram explode (pure Catalyst, no per-doc join
  keys other than the bigram itself) + join against the count tables —
  broadcast when the vocab fits (measured-size decision left to AQE),
  shuffle-hash on (w1) otherwise — then one groupBy(doc_id) to average.
  Nothing all-pairs, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prefix_filter_spark.sources.tokenizer import words_col


def _bigrams(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, w1, w2) — one row per consecutive word pair, built
    map-side with a sequence/transform (no self-join, no shuffle)."""
    ws = words_col(text_col)
    pairs = F.transform(
        F.sequence(F.lit(0), F.size(ws) - 2),
        lambda i: F.struct(
            F.element_at(ws, i + 1).alias("w1"),
            F.element_at(ws, i + 2).alias("w2"),
        ),
    )
    return (
        docs.where(F.size(ws) >= 2)
        .select("doc_id", F.explode(pairs).alias("bg"))
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )


def train_bigram_counts(
    ref_docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """Train the LM: (unigram counts, bigram counts, vocab size) over
    the reference corpus. Unigram counts exclude each doc's last word —
    they are continuation denominators c(u) = Σ_w c(u, w), so the
    smoothed distribution Σ_w p(w|u) sums to exactly 1."""
    bg = _bigrams(ref_docs, text_col)
    bigrams = bg.groupBy("w1", "w2").agg(F.count("*").alias("c_bg"))
    unigrams = bg.groupBy("w1").agg(F.count("*").alias("c_u"))
    ws = words_col(text_col)
    vocab = (
        ref_docs.select(F.explode(ws).alias("w")).agg(
            F.countDistinct("w").alias("v")
        )
    ).collect()[0]["v"]
    return unigrams, bigrams, int(vocab)


def lm_perplexity(
    docs: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    vocab_size: int,
    alpha: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Score docs under the trained LM: (doc_id, n_bigrams, avg_nll,
    perplexity). avg_nll is the mean negative log2 probability of the
    doc's bigrams; unseen words/bigrams fall back to the add-alpha
    floor (left joins; coalesce(count, 0)).

    Deterministic reduction: a plain F.avg over doubles is partial-
    aggregation-order dependent (partitioning can flip the last ulp,
    which flips a round() at a boundary and reddens the hash gate on
    bigger SFs). Instead each bigram's nll is quantized to 1e-9
    (``round(nll * 1e9) -> bigint``) and summed as exact integers — a
    commutative, associative reduction, so avg_nll is a pure function
    of the data regardless of partitioning or executor count. The 1e-9
    quantum is far below any meaningful perplexity difference."""
    bg = _bigrams(docs, text_col)
    scored = (
        bg.join(bigrams, ["w1", "w2"], "left")
        .join(unigrams, ["w1"], "left")
        .select(
            "doc_id",
            (
                -F.log2(
                    (F.coalesce(F.col("c_bg"), F.lit(0)) + F.lit(float(alpha)))
                    / (
                        F.coalesce(F.col("c_u"), F.lit(0))
                        + F.lit(float(alpha) * vocab_size)
                    )
                )
            ).alias("nll"),
        )
    )
    quant = scored.select(
        "doc_id", F.round(F.col("nll") * F.lit(1e9), 0).cast("long").alias("nll_q")
    )
    avg = F.sum("nll_q").cast("double") / (F.count("*") * F.lit(1e9))
    return quant.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        avg.alias("avg_nll"),
        F.pow(F.lit(2.0), avg).alias("perplexity"),
    )


def perplexity_buckets(
    scores: DataFrame, cutoffs: tuple[float, float]
) -> Column:
    """CCNet's head/middle/tail split: a column expression bucketing
    ``perplexity`` at the two cutoffs (head < c0 <= middle < c1 <= tail).
    CCNet computes cutoffs as per-language percentiles — pair with the
    KLL sketch (sketches/kll.py) to get them in one pass at scale."""
    c0, c1 = cutoffs
    return (
        F.when(scores["perplexity"] < c0, F.lit("head"))
        .when(scores["perplexity"] < c1, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
