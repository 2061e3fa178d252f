"""Deterministic sampling: exact per-stratum counts, reproducibility,
mixture weighting, and the map-only bernoulli fraction tolerance."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from prefix_filter_spark.operators.sampling import (
    bernoulli_sample,
    stratified_sample_exact,
)


def _mk(spark, n=6_000, n_src=6, parts=8):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % n_src).cast("string")).alias("source"),
        (F.col("id") * 7 % 1000).alias("n_chars"),
    ).repartition(parts)


def test_exact_counts_per_stratum(spark):
    df = _mk(spark)
    fracs = {"s0": 0.5, "s1": 0.25, "s2": 0.1, "s3": 1.0}
    out = stratified_sample_exact(
        df, "source", fracs, F.xxhash64("doc_id", F.lit(3)), "doc_id"
    )
    got = out.groupBy("source").agg(F.count("*").alias("n")).toPandas()
    got = dict(zip(got["source"], got["n"]))
    # 1000 docs per source; strata outside the map default to frac 0
    assert got == {"s0": 500, "s1": 250, "s2": 100, "s3": 1000}


def test_reproducible_and_seed_sensitive(spark):
    df = _mk(spark, n=2_000)
    kw = dict(strata_col="source", fracs=0.3, tie_col="doc_id")
    a = stratified_sample_exact(df, order_col=F.xxhash64("doc_id", F.lit(1)), **kw)
    b = stratified_sample_exact(df, order_col=F.xxhash64("doc_id", F.lit(1)), **kw)
    c = stratified_sample_exact(df, order_col=F.xxhash64("doc_id", F.lit(2)), **kw)
    ids = lambda d: sorted(r["doc_id"] for r in d.select("doc_id").collect())
    assert ids(a) == ids(b)
    assert ids(a) != ids(c)  # different seed, different (same-sized) draw
    assert len(ids(c)) == len(ids(a))


def test_matches_pandas_reference(spark):
    """Rank semantics match an exact pandas recompute row-for-row."""
    df = _mk(spark, n=900, n_src=3, parts=5)
    out = stratified_sample_exact(
        df, "source", 0.2, F.xxhash64("doc_id", F.lit(9)), "doc_id"
    )
    got = sorted(r["doc_id"] for r in out.collect())
    pdf = df.withColumn("h", F.xxhash64("doc_id", F.lit(9))).toPandas()
    keep = []
    for _, g in pdf.groupby("source"):
        g = g.sort_values(["h", "doc_id"])
        keep.extend(g.head(int(np.ceil(0.2 * len(g))))["doc_id"])
    assert got == sorted(keep)


def test_bernoulli_fraction_and_determinism(spark):
    df = _mk(spark, n=50_000)
    h = F.xxhash64("doc_id", F.lit(4))
    a = bernoulli_sample(df, 0.2, h).count()
    b = bernoulli_sample(df, 0.2, h).count()
    assert a == b
    # binomial(50k, 0.2): 5 sigma ~ 0.009
    assert abs(a / 50_000 - 0.2) < 0.01


def test_bernoulli_plan_is_map_only(spark):
    df = _mk(spark, n=100)
    plan = (
        bernoulli_sample(df, 0.5, F.xxhash64("doc_id", F.lit(1)))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan and "Sort" not in plan


def test_bernoulli_frac_one_keeps_all(spark):
    """frac=1.0 must keep every row (round-3 regression: the bound
    2^63 did not fit LongType and the lit() failed)."""
    df = _mk(spark, n=500)
    h = F.xxhash64("doc_id", F.lit(4))
    assert bernoulli_sample(df, 1.0, h).count() == 500
    assert bernoulli_sample(df, 0.0, h).count() == 0


# -------------------- Efraimidis-Spirakis weighted without-replacement
def test_es_sample_matches_python_reference(spark):
    """Selected set == a pure-Python evaluation of the same key formula
    (ln(U)/w, U from the collected xxhash64 values), k distinct rows,
    exactly partition-invariant."""
    import math

    from prefix_filter_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    df = _mk(spark, n=400).withColumn(
        "wgt", (F.col("doc_id") % 5 + 1).cast("double")
    )
    hashes = {
        r["doc_id"]: r["h"]
        for r in df.select(
            "doc_id", F.xxhash64("doc_id", F.lit(7)).alias("h")
        ).collect()
    }
    wgts = {r["doc_id"]: r["wgt"] for r in df.select("doc_id", "wgt").collect()}

    def key(d):
        u = (float(hashes[d]) + 2.0**63 + 0.5) / 2.0**64
        return math.log(u) / wgts[d]

    want = set(sorted(hashes, key=lambda d: (-key(d), d))[:25])
    for parts in (1, 8):
        got = {
            r["doc_id"]
            for r in weighted_sample_without_replacement(
                df.repartition(parts), 25, F.col("wgt"), "doc_id", seed=7
            ).collect()
        }
        assert got == want
    assert len(want) == 25


def test_es_sample_frequency_proportional_to_weight(spark):
    """k=1 over 4000 seeds in ONE job (explode seeds, max_by per seed):
    empirical pick frequency tracks weight within 5 sigma."""
    from pyspark.sql import functions as F2

    rows = [(0, 1.0), (1, 2.0), (2, 4.0), (3, 8.0)]
    df = spark.createDataFrame(rows, "doc_id long, wgt double")
    n_seeds = 4000
    seeded = df.crossJoin(
        spark.range(n_seeds).select(F2.col("id").alias("seed"))
    )
    u = (
        F2.xxhash64("doc_id", "seed").cast("double") + F2.lit(2.0**63) + F2.lit(0.5)
    ) / F2.lit(2.0**64)
    keyed = seeded.withColumn("key", F2.log(u) / F2.col("wgt"))
    picks = (
        keyed.groupBy("seed")
        .agg(F2.max_by("doc_id", "key").alias("pick"))
        .groupBy("pick")
        .count()
        .collect()
    )
    freq = {r["pick"]: r["count"] / n_seeds for r in picks}
    total_w = sum(w for _, w in rows)
    for d, w in rows:
        p = w / total_w
        sigma = (p * (1 - p) / n_seeds) ** 0.5
        assert abs(freq.get(d, 0.0) - p) < 5 * sigma, (d, freq.get(d), p)


def test_es_sample_edge_cases(spark):
    import pytest as pt

    from prefix_filter_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    df = _mk(spark, n=10).withColumn(
        "wgt", F.when(F.col("doc_id") < 3, 0.0).otherwise(F.lit(1.0))
    )
    # zero-weight rows can never be selected; k > eligible returns all eligible
    got = weighted_sample_without_replacement(
        df, 100, F.col("wgt"), "doc_id"
    ).collect()
    assert sorted(r["doc_id"] for r in got) == list(range(3, 10))
    with pt.raises(ValueError):
        weighted_sample_without_replacement(df, 0, F.col("wgt"), "doc_id")


def test_es_sample_plan_is_take_ordered(spark):
    """No global sort, no exchange: per-partition top-k + k-row merge."""
    from prefix_filter_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    df = _mk(spark, n=1000).withColumn("wgt", F.lit(1.0))
    plan = (
        weighted_sample_without_replacement(df, 10, F.col("wgt"), "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_es_per_stratum_counts_and_twin(spark):
    """Per-stratum ES: exact k per source, equals the global sampler
    applied to each stratum alone (same key formula), partition-
    invariant."""
    from prefix_filter_spark.operators.sampling import (
        weighted_sample_per_stratum,
        weighted_sample_without_replacement,
    )

    df = _mk(spark, n=600).withColumn(
        "wgt", (F.col("doc_id") % 7 + 1).cast("double")
    )
    ks = {"s0": 5, "s1": 10, "s2": 0, "s3": 3}
    got = weighted_sample_per_stratum(
        df, ks, F.col("wgt"), "source", "doc_id", seed=9
    )
    rows = got.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    assert {s: len(v) for s, v in by_src.items()} == {
        "s0": 5, "s1": 10, "s3": 3
    }
    # twin: the global sampler on each stratum alone picks the same set
    for s, k in ks.items():
        if k == 0:
            continue
        want = {
            r["doc_id"]
            for r in weighted_sample_without_replacement(
                df.where(F.col("source") == s), k, F.col("wgt"), "doc_id", seed=9
            ).collect()
        }
        assert by_src[s] == want
    # partition invariance
    again = {
        (r["source"], r["doc_id"])
        for r in weighted_sample_per_stratum(
            df.repartition(11), ks, F.col("wgt"), "source", "doc_id", seed=9
        ).collect()
    }
    assert again == {(r["source"], r["doc_id"]) for r in rows}


def test_es_per_stratum_scalar_k_caps_at_stratum_size(spark):
    from prefix_filter_spark.operators.sampling import (
        weighted_sample_per_stratum,
    )

    df = _mk(spark, n=30, n_src=3).withColumn("wgt", F.lit(1.0))
    got = weighted_sample_per_stratum(
        df, 100, F.col("wgt"), "source", "doc_id"
    )
    assert got.count() == 30  # k > n_s keeps whole strata, no dupes
