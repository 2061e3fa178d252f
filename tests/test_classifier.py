"""Naive Bayes quality classifier: sequential-reference equality,
partition invariance, separability, and filter semantics."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from prefix_filter_spark.operators.classifier import (
    LLR_SCALE,
    nb_filter,
    nb_score,
    nb_train,
)

B = 1 << 15


def _bucket_py(w: str) -> int:
    return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % B


def _words(text: str) -> list[str]:
    return [w for w in text.lower().split() if w]


def _nb_reference(rows, alpha=1.0):
    """Sequential NB over (text, label) rows -> dict doc_idx -> score_fp."""
    c_pos: dict[int, int] = {}
    c_neg: dict[int, int] = {}
    n_pos = n_neg = t_pos = t_neg = 0
    for text, y in rows:
        if y:
            n_pos += 1
        else:
            n_neg += 1
        for w in _words(text):
            b = _bucket_py(w)
            if y:
                c_pos[b] = c_pos.get(b, 0) + 1
                t_pos += 1
            else:
                c_neg[b] = c_neg.get(b, 0) + 1
                t_neg += 1
    dp, dn = t_pos + alpha * B, t_neg + alpha * B
    prior = round(LLR_SCALE * math.log(n_pos / n_neg))

    def llr(b: int) -> int:
        return round(
            LLR_SCALE
            * (
                math.log((c_pos.get(b, 0) + alpha) / dp)
                - math.log((c_neg.get(b, 0) + alpha) / dn)
            )
        )

    out = {}
    for i, (text, _y) in enumerate(rows):
        out[i] = prior + sum(llr(_bucket_py(w)) for w in _words(text))
    return out


ROWS = [
    ("the quick brown fox jumps over the lazy dog", True),
    ("pellentesque habitant morbi tristique senectus", False),
    ("the fox and the hound are friends", True),
    ("lorem ipsum dolor sit amet consectetur", False),
    ("a lazy dog sleeps under the brown tree", True),
    ("vestibulum ante ipsum primis in faucibus", False),
    ("", True),  # empty doc: score must equal the prior
]


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(
        [(i, t, y) for i, (t, y) in enumerate(ROWS)], "doc_id long, text string, y boolean"
    )


def test_matches_sequential_reference(spark, tiny):
    model = nb_train(tiny, "y", n_buckets=B)
    got = {
        r["doc_id"]: r["score_fp"]
        for r in nb_score(tiny, model).collect()
    }
    want = _nb_reference(ROWS)
    assert got == want


def test_partition_invariance(spark, tiny):
    model1 = nb_train(tiny.repartition(1), "y", n_buckets=B)
    model7 = nb_train(tiny.repartition(7, "doc_id"), "y", n_buckets=B)
    s1 = sorted(nb_score(tiny.repartition(5), model1).collect())
    s7 = sorted(nb_score(tiny.coalesce(1), model7).collect())
    assert s1 == s7
    assert (model1.prior_fp, model1.unseen_fp) == (model7.prior_fp, model7.unseen_fp)


def test_separates_real_sources(spark, documents):
    """Train on lang=='en' over the testdata docs; English held-in docs
    must score above the non-English mean (the CCNet use case)."""
    docs = documents.select("doc_id", "text", (F.col("lang") == "en").alias("y"))
    model = nb_train(docs, "y")
    scored = nb_score(docs, model).join(docs.select("doc_id", "y"), "doc_id")
    means = (
        scored.groupBy("y").agg(F.avg("score_fp").alias("m")).collect()
    )
    by = {r["y"]: r["m"] for r in means}
    assert by[True] > by[False]


def test_filter_threshold_semantics(spark, tiny):
    model = nb_train(tiny, "y", n_buckets=B)
    scored = nb_score(tiny, model)
    kept = set(r["doc_id"] for r in nb_filter(tiny, model, threshold=0.5).collect())
    want = set(r["doc_id"] for r in scored.where(F.col("score_fp") > 0).collect())
    assert kept == want
    with pytest.raises(ValueError):
        nb_filter(tiny, model, threshold=1.0)


def test_empty_doc_scores_prior(spark, tiny):
    model = nb_train(tiny, "y", n_buckets=B)
    empty = {r["doc_id"]: r for r in nb_score(tiny, model).collect()}[6]
    assert empty["n_feats"] == 0
    assert empty["score_fp"] == model.prior_fp


def test_single_class_raises(spark, tiny):
    with pytest.raises(ValueError):
        nb_train(tiny.where("y"), "y", n_buckets=B)
