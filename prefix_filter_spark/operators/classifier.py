"""Hashed-token Naive Bayes quality classifier (CCNet / fastText-style
document quality filter).

The standard LLM-pipeline quality stage (Wenzek et al. 2020, CCNet;
Brown et al. 2020 GPT-3 appendix A) trains a cheap linear classifier on
a "looks like the good corpus" label and keeps high-scoring documents.
A hashed bag-of-words Naive Bayes model IS that linear classifier:
score(doc) = log P(pos)/P(neg) + sum over token occurrences of the
per-bucket log-likelihood ratio — a single sparse dot product, which is
also exactly fastText's model shape (linear over hashed n-gram
features) minus the softmax training loop.

Spark shape (everything bounded by the bucket count B except one
doc-key shuffle):

- feature explode is map-side (the shared pre-projected word array —
  see dsir.hashed_features for the O(len^2) trap it avoids);
- training is ONE groupBy(bucket) aggregation with conditional sums
  (<= B output rows) plus a 1-row total agg — no per-class scans;
- the <=B-row log-likelihood-ratio table broadcast-joins onto the
  feature stream; scoring's only corpus-sized exchange is the final
  groupBy(doc_id).

At 10^12 sequences: training reads the (bounded) labeled seed, never
the full corpus; scoring touches the corpus once, map-side except the
per-doc sum; the model is a B-row broadcast (B = 2^15 default, ~0.5 MB).

Determinism across engines (the gate requirement): bucket hash =
md5-prefix mod B (same expression both engines, see dsir._bucket), and
the per-bucket log-likelihood ratio is quantized to integer fixed
point (LLR_SCALE) BEFORE the per-doc sum, so a document's score is an
exact integer sum — partition/accumulation order cannot perturb it
(the lm_perplexity float-avg lesson).

Reference scope note: the reference repo (TomerEven/Prefix-Filter) has
no classifier; this extends the training-data family.
"""

from __future__ import annotations

import math
from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prefix_filter_spark.operators.dsir import _bucket
from prefix_filter_spark.sources.tokenizer import words_col

#: fixed-point scale for per-bucket log-likelihood ratios (1e4 nats).
LLR_SCALE = 10_000


class NbModel(NamedTuple):
    """Trained model: a <=B-row DataFrame plus the scalar constants the
    score folds in for buckets never seen in training."""

    llr: DataFrame  # (bucket bigint, llr_fp bigint)
    prior_fp: int  # round(LLR_SCALE * ln(n_pos / n_neg))
    unseen_fp: int  # llr_fp for a bucket absent from training
    n_buckets: int


def _features(docs: DataFrame, text_col: str, n_buckets: int) -> DataFrame:
    """(doc_id, bucket) — one row per word OCCURRENCE, map-side only."""
    wsd = docs.select("doc_id", words_col(text_col).alias("_ws"))
    return wsd.select("doc_id", F.explode("_ws").alias("w")).select(
        "doc_id", _bucket(F.col("w"), n_buckets)
    )


def nb_train(
    docs: DataFrame,
    label_col,
    *,
    text_col: str = "text",
    n_buckets: int = 1 << 15,
    alpha: float = 1.0,
) -> NbModel:
    """Fit the two-class multinomial NB model.

    ``label_col`` is a boolean Column (or name): True = positive class.
    Smoothing is Laplace add-``alpha`` over the B buckets. Collects
    exactly four scalars (class doc counts + class token totals) — the
    model itself stays distributed until broadcast at score time.
    """
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    # keep the label through the explode — no doc-key join needed
    feats = (
        docs.select(lab.cast("boolean").alias("_y"), words_col(text_col).alias("_ws"))
        .select("_y", F.explode("_ws").alias("w"))
        .select("_y", _bucket(F.col("w"), n_buckets))
    )
    # one pass: conditional counts per bucket for both classes
    counts = feats.groupBy("bucket").agg(
        F.sum(F.col("_y").cast("long")).alias("c_pos"),
        F.sum((~F.col("_y")).cast("long")).alias("c_neg"),
    )
    tot = counts.agg(
        F.sum("c_pos").alias("t_pos"), F.sum("c_neg").alias("t_neg")
    ).collect()[0]
    t_pos, t_neg = int(tot["t_pos"] or 0), int(tot["t_neg"] or 0)
    nd = docs.agg(
        F.sum(lab.cast("long")).alias("n_pos"), F.count("*").alias("n")
    ).collect()[0]
    n_pos = int(nd["n_pos"] or 0)
    n_neg = int(nd["n"]) - n_pos
    if n_pos == 0 or n_neg == 0:
        raise ValueError("nb_train needs at least one doc of each class")
    denom_pos = float(t_pos + alpha * n_buckets)
    denom_neg = float(t_neg + alpha * n_buckets)
    llr = counts.select(
        "bucket",
        F.round(
            (
                F.log((F.col("c_pos") + F.lit(float(alpha))) / F.lit(denom_pos))
                - F.log((F.col("c_neg") + F.lit(float(alpha))) / F.lit(denom_neg))
            )
            * F.lit(LLR_SCALE)
        )
        .cast("bigint")
        .alias("llr_fp"),
    )
    prior_fp = round(LLR_SCALE * math.log(n_pos / n_neg))
    unseen_fp = round(
        LLR_SCALE * (math.log(alpha / denom_pos) - math.log(alpha / denom_neg))
    )
    return NbModel(llr, int(prior_fp), int(unseen_fp), n_buckets)


def nb_score(
    docs: DataFrame, model: NbModel, *, text_col: str = "text"
) -> DataFrame:
    """Score docs under the trained model.

    -> (doc_id, n_feats bigint, score_fp bigint, prob double).
    score_fp = prior + sum of per-occurrence llr_fp (exact integer);
    prob = sigmoid(score_fp / LLR_SCALE), a pure function of score_fp.
    Empty docs score prior only. Map-only except one groupBy(doc_id).
    """
    feats = _features(docs, text_col, model.n_buckets)
    scored = feats.join(F.broadcast(model.llr), "bucket", "left")
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_feats"),
        F.sum(F.coalesce("llr_fp", F.lit(model.unseen_fp))).alias("s"),
    )
    score = F.coalesce("s", F.lit(0)) + F.lit(model.prior_fp)
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_feats", F.lit(0)).cast("bigint").alias("n_feats"),
            score.cast("bigint").alias("score_fp"),
            (
                F.lit(1.0)
                / (F.lit(1.0) + F.exp(-(score.cast("double") / F.lit(float(LLR_SCALE)))))
            ).alias("prob"),
        )
    )


def nb_filter(
    docs: DataFrame,
    model: NbModel,
    *,
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Keep docs whose positive-class probability clears ``threshold``
    (the pipeline's quality-filter form). Pure map + one doc shuffle;
    the comparison runs on the exact integer score, not the float
    sigmoid: prob > t  <=>  score_fp > LLR_SCALE * logit(t)."""
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    cut = LLR_SCALE * math.log(threshold / (1.0 - threshold))
    kept = nb_score(docs, model, text_col=text_col).where(
        F.col("score_fp").cast("double") > F.lit(cut)
    )
    return docs.join(kept.select("doc_id"), "doc_id", "left_semi")
