"""Per-source KL drift: equality with a dense NumPy reference (the
closed-form unobserved factoring must match the full |S|x|V| sum),
drifted-source ranking, and degenerate inputs."""

import numpy as np
import pytest

from prefix_filter_spark.operators.drift import source_drift


def _mk(spark):
    import random

    rng = random.Random(3)
    common = [f"c{i}" for i in range(50)]
    rows = []
    for i in range(300):
        # s0/s1 dominate the corpus with the shared vocab; s2 is a
        # small jargon-heavy minority, so q ~ the majority mix and
        # only s2 drifts from it
        src = "s2" if i % 30 == 0 else f"s{i % 2}"
        words = [rng.choice(common) for _ in range(30)]
        if src == "s2":
            words += [f"jargon{rng.randint(0, 9)}" for _ in range(60)]
        rows.append((i, src, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def _dense_reference(pdf, alpha=0.5):
    """Dense |S|x|V| smoothed-KL computation in NumPy."""
    from collections import Counter, defaultdict

    per_src = defaultdict(Counter)
    for _, r in pdf.iterrows():
        ws = [w for w in r["text"].lower().split(" ") if w]
        per_src[r["source"]].update(ws)
    corpus = Counter()
    for c in per_src.values():
        corpus.update(c)
    vocab = sorted(corpus)
    V = len(vocab)
    n_all = sum(corpus.values())
    q = np.array([(corpus[w] + alpha) for w in vocab]) / (n_all + alpha * V)
    out = {}
    for s, cnt in per_src.items():
        n_s = sum(cnt.values())
        p = np.array([(cnt.get(w, 0) + alpha) for w in vocab]) / (n_s + alpha * V)
        out[s] = float(np.sum(p * np.log2(p / q)))
    return out


def test_matches_dense_reference(spark):
    docs = _mk(spark)
    got = {r["source"]: r["kl_bits"] for r in source_drift(docs).collect()}
    want = _dense_reference(docs.toPandas())
    assert set(got) == set(want)
    for s in got:
        assert abs(got[s] - want[s]) < 1e-6, (s, got[s], want[s])


def test_jargon_source_most_drifted(spark):
    rows = source_drift(_mk(spark)).collect()
    assert rows[0]["source"] == "s2"  # ordered most-drifted first
    assert rows[0]["kl_bits"] > rows[-1]["kl_bits"] >= 0 or rows[-1]["kl_bits"] > -1e-6


def test_empty_and_alpha_guard(spark):
    empty = spark.createDataFrame([], "doc_id long, source string, text string")
    assert source_drift(empty).count() == 0
    with pytest.raises(ValueError):
        source_drift(_mk(spark), alpha=0.0)
