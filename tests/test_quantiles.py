"""KLL + t-digest: rank-error bounds vs exact, merge-order invariance
within bound, Spark build path vs exact quantiles."""

import random

import numpy as np
import pytest

from prefix_filter_spark.sketches import kll, tdigest

QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _true_rank(sorted_data, value):
    return np.searchsorted(sorted_data, value, side="right") / len(sorted_data)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    return np.concatenate([rng.lognormal(3, 1, 150_000), rng.exponential(50, 50_000)])


def test_kll_rank_error(data):
    sk = kll.KllSketch(kll.KllConfig(k=200, seed=1))
    sk.update(data)
    s = np.sort(data)
    for q in QS:
        v = sk.quantile(q)
        assert abs(_true_rank(s, v) - q) <= 0.025, (q, v)


def test_kll_merge_any_order_within_bound(data):
    cfg = kll.KllConfig(k=200, seed=2)
    parts = np.array_split(data, 8)
    states = []
    for p in parts:
        sk = kll.KllSketch(cfg)
        sk.update(p)
        states.append(sk.to_bytes())
    s = np.sort(data)
    for t in range(3):
        st = list(states)
        random.Random(t).shuffle(st)
        merged = kll.KllSketch.from_bytes(kll.merge_states(st))
        assert merged.n_total == len(data)
        for q in QS:
            v = merged.quantile(q)
            assert abs(_true_rank(s, v) - q) <= 0.03, (t, q)


def test_kll_serde_roundtrip(data):
    sk = kll.KllSketch(kll.KllConfig(k=128, seed=3))
    sk.update(data[:10_000])
    rt = kll.KllSketch.from_bytes(sk.to_bytes())
    assert rt.to_bytes() == sk.to_bytes()
    assert rt.quantile(0.5) == sk.quantile(0.5)


def test_tdigest_rank_error(data):
    td = tdigest.TDigest(tdigest.TDigestConfig(delta=200))
    td.update(data)
    s = np.sort(data)
    for q in QS:
        v = td.quantile(q)
        tol = 0.01 if 0.1 <= q <= 0.9 else 0.005  # tails tighter for t-digest
        assert abs(_true_rank(s, v) - q) <= tol, (q, v)


def test_tdigest_merge_any_order_within_bound(data):
    cfg = tdigest.TDigestConfig(delta=200)
    parts = np.array_split(data, 10)
    states = []
    for p in parts:
        td = tdigest.TDigest(cfg)
        td.update(p)
        states.append(td.to_bytes())
    s = np.sort(data)
    for t in range(3):
        st = list(states)
        random.Random(t).shuffle(st)
        merged = tdigest.TDigest.from_bytes(tdigest.merge_states(st))
        for q in QS:
            v = merged.quantile(q)
            assert abs(_true_rank(s, v) - q) <= 0.015, (t, q)


def test_tdigest_weight_conservation(data):
    td = tdigest.TDigest(tdigest.TDigestConfig(delta=100))
    td.update(data)
    td._flush()
    assert td.weights.sum() == len(data)
    assert len(td.means) <= 2 * 100 + 10


def test_spark_quantiles_vs_exact(spark):
    """n_chars quantiles over sf0.001 docs through the Spark build path."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pdf = docs.select("n_chars").toPandas()
    exact = np.sort(pdf["n_chars"].to_numpy())

    row = kll.build_kll(docs, "n_chars", kll.KllConfig(k=200, seed=42)).collect()[0]
    sk = kll.KllSketch.from_bytes(bytes(row["state"]))
    assert sk.n_total == len(exact)
    for q in (0.25, 0.5, 0.9):
        assert abs(_true_rank(exact, sk.quantile(q)) - q) <= 0.03

    row = tdigest.build_tdigest(
        docs, "n_chars", tdigest.TDigestConfig(delta=200)
    ).collect()[0]
    td = tdigest.TDigest.from_bytes(bytes(row["state"]))
    for q in (0.25, 0.5, 0.9):
        assert abs(_true_rank(exact, td.quantile(q)) - q) <= 0.03


def test_kll_rank_and_range_fraction(spark):
    """kll_rank SQL UDF and kll.range_fraction: CDF within rank_eps of
    exact, range selectivity matches the exact in-range fraction."""
    import numpy as np
    from pyspark.sql import functions as F

    from prefix_filter_spark.functions import register_sketch_sql
    from prefix_filter_spark.sketches import kll

    n = 20_000
    df = spark.range(n).select((F.col("id") % 1000).alias("v"))
    cfg = kll.KllConfig(k=200, seed=1)
    state = bytes(
        kll.build_kll(df, "v", cfg).select("state").collect()[0]["state"]
    )
    eps = cfg.rank_eps() + 0.01
    sk = kll.KllSketch.from_bytes(state)
    for v, exact in ((99, 0.1), (499, 0.5), (999, 1.0)):
        assert abs(sk.rank(v) - exact) <= eps
    # range selectivity vs exact
    for lo, hi, exact in ((100, 299, 0.2), (0, 999, 1.0), (500, 499, 0.0)):
        assert abs(kll.range_fraction(state, lo, hi) - exact) <= 2 * eps
    # SQL surface
    register_sketch_sql(spark)
    sdf = spark.createDataFrame([(state,)], "state binary")
    sdf.createOrReplaceTempView("kll_states_t")
    got = spark.sql(
        "SELECT kll_rank(state, 499.0) AS r FROM kll_states_t"
    ).first()["r"]
    assert abs(got - 0.5) <= eps
