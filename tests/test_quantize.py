"""Embedding int8 quantization (operators/quantize.py)."""

import numpy as np
from pyspark.sql import functions as F

from prefix_filter_spark.operators.quantize import (
    dequantize_col,
    quantization_error,
    quantize_embeddings,
)


def _emb(spark, n=50, dim=16, seed=4):
    rng = np.random.default_rng(seed)
    rows = [(i, (rng.standard_normal(dim) * rng.uniform(0.1, 10)).tolist()) for i in range(n)]
    rows.append((n, [0.0] * dim))  # zero vector edge case
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_codes_in_range_and_numpy_parity(spark):
    emb = _emb(spark)
    got = {r["vec_id"]: (r["q"], r["scale"]) for r in quantize_embeddings(emb).collect()}
    src = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    for vid, (q, scale) in got.items():
        x = np.array(src[vid])
        assert all(-127 <= c <= 127 for c in q)
        if x.any():
            want_scale = np.abs(x).max() / 127.0
            assert abs(scale - want_scale) < 1e-12
            # Spark round() is half-away-from-zero; np.round is
            # half-to-even — compare via floor(x+.5)*sign
            want = np.sign(x) * np.floor(np.abs(x) / want_scale + 0.5)
            assert q == [int(w) for w in want], vid
        else:
            assert scale == 0.0 and set(q) == {0}


def test_error_bound_holds(spark):
    """max_abs_err <= scale/2 + eps for every vector."""
    rep = quantization_error(_emb(spark))
    bad = rep.where(
        F.col("max_abs_err") > F.col("scale") / 2 + F.lit(1e-12)
    ).count()
    assert bad == 0


def test_roundtrip_preserves_cosine(spark):
    """Reconstructed vectors keep cosine ~1 vs originals (int8 drift
    on 16-dim vectors is tiny)."""
    from prefix_filter_spark.operators.similarity import cosine_expr

    emb = _emb(spark)
    qd = quantize_embeddings(emb).where(F.col("scale") > 0)
    recon = qd.select(
        "vec_id",
        F.col("embedding"),
        dequantize_col(F.col("q"), F.col("scale")).alias("r"),
    )
    worst = (
        recon.select(cosine_expr(F.col("embedding"), F.col("r")).alias("c"))
        .agg(F.min("c"))
        .collect()[0][0]
    )
    assert worst > 0.9995, worst
