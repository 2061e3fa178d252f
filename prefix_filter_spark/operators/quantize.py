"""Embedding quantization — the storage/bandwidth path for vector
columns at 100 TB: symmetric per-vector int8 (4× smaller than float32,
the standard serving format for ANN corpora; see e.g. FAISS SQ8).

Pure Catalyst (transform / aggregate over the array column) — map-only,
zero shuffles, exactly reproducible in DuckDB for the oracle: the
quantizer is round(x / scale) with scale = max|x| / 127, both engines
computing in double and rounding half-away-from-zero.

Composes with the similarity operators: quantized corpora feed
cosine_topk / IVF / SRP after dequantize (or directly — int8 dot
products bound the cosine error at ~scale·√dim; quantization_error
measures the actual drift per vector so the recall cost is observable,
not assumed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _absmax(col: Column) -> Column:
    return F.aggregate(
        col, F.lit(0.0), lambda acc, v: F.greatest(acc, F.abs(v))
    )


def quantize_embeddings(
    emb: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """(…, q: array<int> in [-127,127], scale: double). Zero vectors get
    scale 0 and all-zero codes (guarded division)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = (_absmax(v) / F.lit(127.0)).alias("scale")
    out = emb.withColumn("scale", scale)
    q = F.transform(
        v,
        lambda x: F.when(F.col("scale") > 0, F.round(x / F.col("scale")))
        .otherwise(F.lit(0.0))
        .cast("int"),
    )
    return out.withColumn("q", q)


def dequantize_col(q: Column, scale: Column) -> Column:
    """array<int> codes + scale -> array<double>."""
    return F.transform(q, lambda c: c.cast("double") * scale)


def quantization_error(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-vector reconstruction report: (vec_id, scale, max_abs_err,
    rel_err). max_abs_err ≤ scale/2 by construction — the gate asserts
    the bound rather than trusting it."""
    qd = quantize_embeddings(emb, vec_col)
    recon = dequantize_col(F.col("q"), F.col("scale"))
    orig = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    err = F.aggregate(
        F.zip_with(orig, recon, lambda a, b: F.abs(a - b)),
        F.lit(0.0),
        lambda acc, v: F.greatest(acc, v),
    )
    norm = F.sqrt(
        F.aggregate(orig, F.lit(0.0), lambda acc, v: acc + v * v)
    )
    return qd.select(
        "vec_id",
        "scale",
        err.alias("max_abs_err"),
        F.when(norm > 0, err / norm).otherwise(F.lit(0.0)).alias("rel_err"),
    )
