"""Corpus power laws: a synthetic Zipfian corpus recovers slope ~ -s
and a near-1 r^2; Heaps exponent lands in (0,1) with good fit;
partition invariance; degenerate corpora."""

import numpy as np

from prefix_filter_spark.operators.corpus_stats import corpus_power_laws


def _zipf_corpus(spark, s=1.0, vocab=2000, n_docs=400, words_per_doc=120):
    rng = np.random.default_rng(2)
    ranks = np.arange(1, vocab + 1)
    probs = ranks ** (-float(s))
    probs /= probs.sum()
    rows = []
    for i in range(n_docs):
        ws = rng.choice(vocab, size=words_per_doc, p=probs)
        rows.append((i, " ".join(f"w{w}" for w in ws)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_zipf_slope_recovered_and_heaps_sane(spark):
    docs = _zipf_corpus(spark, s=1.0)
    r = corpus_power_laws(docs, max_rank=500)
    assert r["n_tokens"] == 400 * 120
    # sampled-frequency tail bends the fit slightly; generous band
    assert -1.25 <= r["zipf_slope"] <= -0.75, r["zipf_slope"]
    assert r["zipf_r2"] > 0.95
    assert 0.3 < r["heaps_beta"] < 1.0, r["heaps_beta"]
    assert r["heaps_r2"] > 0.9
    assert r["heaps_k"] > 0
    # V(n) is monotone and ends at the vocab size
    cps = r["heaps_checkpoints"]
    assert all(v1 <= v2 for (_, v1), (_, v2) in zip(cps, cps[1:]))
    assert cps[-1][1] == r["vocab_size"]


def test_partition_invariant(spark):
    docs = _zipf_corpus(spark, n_docs=120, words_per_doc=40)
    a = corpus_power_laws(docs, max_rank=200)
    b = corpus_power_laws(docs.repartition(13), max_rank=200)
    assert a == b


def test_degenerate_corpora(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert corpus_power_laws(empty)["n_tokens"] == 0
    one = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    r = corpus_power_laws(one)
    assert r["n_tokens"] == 1 and r["vocab_size"] == 1
