"""HLL + CMS: published error bounds, merge associativity (bit-identical
under shuffled orders), Spark build path vs exact + built-in oracles."""

import random

import numpy as np
from pyspark.sql import functions as F

from prefix_filter_spark.sketches import cms, hll


# ---------------- HLL -------------------------------------------------
def test_hll_accuracy_kernel():
    cfg = hll.HllConfig(p=14, seed=1)
    for n in (1_000, 50_000, 1_000_000):
        acc = hll.HllAccumulator(cfg)
        acc.update(np.arange(n, dtype=np.int64))
        est = hll.estimate(acc.to_bytes())
        assert abs(est - n) / n < 3 * cfg.rel_error() * 1.5, (n, est)


def test_hll_merge_bit_identical_any_order():
    cfg = hll.HllConfig(p=12, seed=2)
    rng = np.random.default_rng(0)
    data = rng.integers(0, 10**12, 200_000)
    parts = np.array_split(data, 9)
    states = []
    for p in parts:
        a = hll.HllAccumulator(cfg)
        a.update(p)
        states.append(a.to_bytes())
    full = hll.HllAccumulator(cfg)
    full.update(data)
    expect = full.to_bytes()
    for t in range(4):
        s = list(states)
        random.Random(t).shuffle(s)
        r = random.Random(50 + t)
        while len(s) > 1:
            i = r.randrange(len(s) - 1)
            s.insert(i, hll.merge_states([s.pop(i), s.pop(i)]))
        assert s[0] == expect


def test_hll_spark_build_vs_exact(spark, documents):
    from prefix_filter_spark.sources import tokenizer

    toks = tokenizer.exploded_tokens(tokenizer.tokenize_documents(documents))
    cfg = hll.HllConfig(p=14, seed=42)
    est = hll.distinct_estimate(toks, "token", cfg)
    exact = toks.select("token").distinct().count()
    assert abs(est - exact) / max(exact, 1) < 0.05
    # built-in oracle agrees on the same column
    spark_est = toks.agg(F.approx_count_distinct("token").alias("e")).collect()[0]["e"]
    assert abs(spark_est - exact) / max(exact, 1) < 0.1


# ---------------- CMS -------------------------------------------------
def test_cms_bounds_kernel():
    cfg = cms.CmsConfig(width=8192, depth=5, seed=3)
    rng = np.random.default_rng(1)
    # zipf-ish stream with heavy hitters
    data = rng.zipf(1.3, 500_000)
    data = data[data < 100_000]
    acc = cms.CmsAccumulator(cfg)
    acc.update(data)
    state = acc.to_bytes()
    keys = np.arange(1, 50)
    true = np.array([(data == k).sum() for k in keys])
    est = cms.point_estimates(state, keys, cfg)
    assert (est >= true).all()  # one-sided guarantee
    n = cms.total_count(state)
    assert (est <= true + cfg.eps * n).all()


def test_cms_merge_bit_identical_any_order():
    cfg = cms.CmsConfig(width=1024, depth=4, seed=4)
    rng = np.random.default_rng(2)
    data = rng.integers(0, 1000, 100_000)
    parts = np.array_split(data, 7)
    states = []
    for p in parts:
        a = cms.CmsAccumulator(cfg)
        a.update(p)
        states.append(a.to_bytes())
    full = cms.CmsAccumulator(cfg)
    full.update(data)
    expect = full.to_bytes()
    for t in range(3):
        s = list(states)
        random.Random(t).shuffle(s)
        while len(s) > 1:
            s = [cms.merge_states(s[:2])] + s[2:]
        assert s[0] == expect


def test_cms_spark_heavy_hitters(spark, documents):
    from prefix_filter_spark.sources import tokenizer

    toks = tokenizer.exploded_tokens(tokenizer.tokenize_documents(documents))
    cfg = cms.CmsConfig(width=8192, depth=5, seed=42)
    row = cms.build_cms(toks, "token", cfg).collect()[0]
    state = bytes(row["state"])
    top = (
        toks.groupBy("token").count().orderBy(F.desc("count"), "token").limit(10).toPandas()
    )
    est = cms.point_estimates(state, top["token"].to_numpy(), cfg)
    true = top["count"].to_numpy()
    n = cms.total_count(state)
    assert (est >= true).all()
    assert (est <= true + cfg.eps * n).all()
    assert n == toks.count()


def test_tree_merge_produces_single_row(spark):
    cfg = hll.HllConfig(p=10, seed=5)
    df = spark.range(100_000).repartition(16)
    merged = hll.build_hll(df, "id", cfg)
    rows = merged.collect()
    assert len(rows) == 1
    est = hll.estimate(bytes(rows[0]["state"]))
    assert abs(est - 100_000) / 100_000 < 0.1
    # lineage columns survive the tree merge
    assert rows[0]["input_rows"] == 100_000


def test_hll_sparse_same_registers_and_estimate():
    """Sparse serialization: identical register content + estimate,
    much smaller state while the sketch is far from full."""
    vals = np.arange(500, dtype=np.int64)
    dense_acc = hll.HllAccumulator(hll.HllConfig(p=14, sparse=False))
    sparse_acc = hll.HllAccumulator(hll.HllConfig(p=14, sparse=True))
    dense_acc.update(vals)
    sparse_acc.update(vals)
    sd, ss = dense_acc.to_bytes(), sparse_acc.to_bytes()
    pd_, rd = hll._parse_state(sd)
    ps, rs = hll._parse_state(ss)
    assert (pd_, ps) == (14, 14)
    assert np.array_equal(rd, rs)
    assert hll.estimate(sd) == hll.estimate(ss)
    assert len(ss) < len(sd) / 8  # ~1.6 KB vs 16 KB at 500 distinct


def test_hll_sparse_promotes_to_dense_when_full():
    vals = np.arange(50_000, dtype=np.int64)
    acc = hll.HllAccumulator(hll.HllConfig(p=10, sparse=True))
    acc.update(vals)
    # nnz ~ m at 50k >> m=1024: serializer must fall back to dense
    assert len(acc.to_bytes()) == hll._HDR.size + 1024


def test_hll_merge_mixed_formats_equals_dense_merge():
    rng = np.random.default_rng(7)
    parts = [rng.integers(0, 10**12, 300) for _ in range(4)]
    dense_states, mixed_states = [], []
    for i, vals in enumerate(parts):
        d = hll.HllAccumulator(hll.HllConfig(p=12, sparse=False))
        m = hll.HllAccumulator(hll.HllConfig(p=12, sparse=(i % 2 == 0)))
        d.update(vals.astype(np.int64))
        m.update(vals.astype(np.int64))
        dense_states.append(d.to_bytes())
        mixed_states.append(m.to_bytes())
    want = hll.merge_states(dense_states)
    got = hll.merge_states(mixed_states)
    # a mixed merge densifies; content must equal the dense merge
    assert hll._parse_state(got)[1].tolist() == hll._parse_state(want)[1].tolist()
    assert hll.estimate(got) == hll.estimate(want)
    # all-sparse merge stays sparse and round-trips identically
    all_sparse = [
        s for i, s in enumerate(mixed_states) if i % 2 == 0
    ]
    merged_sparse = hll.merge_states(all_sparse)
    assert hll._HDR.unpack_from(merged_sparse, 0)[3] == hll._FMT_SPARSE
