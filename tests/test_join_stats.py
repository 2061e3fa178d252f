"""KMV pre-join cardinality estimation: distinct/overlap/row estimates
within sketch bounds, validated against the exact join."""

import numpy as np
from pyspark.sql import functions as F

from prefix_filter_spark.operators.join_stats import estimate_join
from prefix_filter_spark.sketches import kmv


def test_estimates_match_exact_join(spark):
    # A keys [0, 60k) x2 rows each; B keys [40k, 100k) x3 rows each
    # overlap = 20k keys; exact join rows = 20k * 2 * 3
    cfg = kmv.KmvConfig(k=4096, seed=21)
    a = (
        spark.range(120_000)
        .select((F.col("id") % 60_000).alias("k"))
    )
    b = (
        spark.range(180_000)
        .select((F.col("id") % 60_000 + 40_000).alias("k"))
    )
    est = estimate_join(a, "k", b, "k", cfg)
    ratio = 100_000 / 20_000  # union/intersection for the overlap error
    tol = 4 * cfg.rel_error() * np.sqrt(ratio)
    assert abs(est.distinct_a - 60_000) / 60_000 <= 4 * cfg.rel_error()
    assert abs(est.distinct_b - 60_000) / 60_000 <= 4 * cfg.rel_error()
    assert abs(est.overlap - 20_000) / 20_000 <= tol
    assert abs(est.containment_a - 1 / 3) <= tol
    exact = a.join(b, "k").count()
    assert exact == 20_000 * 2 * 3
    assert abs(est.est_join_rows - exact) / exact <= 2 * tol
    assert est.rows_a == 120_000 and est.rows_b == 180_000


def test_disjoint_sides(spark):
    cfg = kmv.KmvConfig(k=1024, seed=3)
    a = spark.range(30_000).select(F.col("id").alias("k"))
    b = spark.range(50_000, 80_000).select(F.col("id").alias("k"))
    est = estimate_join(a, "k", b, "k", cfg)
    # sampling noise only: tiny spurious overlap, tiny row estimate
    assert est.overlap <= 0.02 * 30_000
    assert est.est_join_rows <= 0.02 * 30_000
