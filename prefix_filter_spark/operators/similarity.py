"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  One Arrow mapInPandas pass with the queries broadcast (big side
  streams, no shuffle); the NumPy cumsum kernel is bit-identical to
  the sequential Catalyst fold (``cosine_expr``), pytest-pinned.
- ``srp_ann_topk``: the scale path — signed-random-projection (SRP)
  LSH bucketing + exact rerank inside candidate buckets. Hyperplanes
  are deterministic (seeded NumPy), generated identically on every
  executor; at 100TB the bucket join replaces the all-pairs cross
  product.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def cosine_expr(a: Column, b: Column) -> Column:
    """Exact cosine similarity of two float-array columns (Catalyst only).

    Cast to double *before* any arithmetic so Spark and DuckDB (which
    promotes FLOAT[] the same way) agree bit-for-bit on the sums.
    """
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(ad, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(bd, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def cosine_pair_udf():
    """Arrow-batched cosine over a PAIR STREAM (two embedding columns
    side by side — the verify stage of every bucketed dedup/ANN path).
    Bit-identical to ``cosine_expr`` (cumsum = strict left-to-right
    fold, exact float32->float64 casts, same final scalar expression),
    so swapping it into a hash-gated pipeline changes no output bit —
    pinned by test_cosine_kernel_bit_identical_to_catalyst's pair twin.
    ~6 interpreted lambda evals x dims per pair become one vectorized
    kernel per Arrow batch."""

    @F.pandas_udf(T.DoubleType())
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        if not len(a):
            return pd.Series([], dtype="float64")
        x = np.array(list(a), dtype=np.float64)
        y = np.array(list(b), dtype=np.float64)
        dots = np.cumsum(x * y, axis=1)[:, -1]
        na = np.sqrt(np.cumsum(x * x, axis=1)[:, -1])
        nb = np.sqrt(np.cumsum(y * y, axis=1)[:, -1])
        return pd.Series(dots / (na * nb))

    # the kernel is pure, but declaring it nondeterministic stops
    # Catalyst's CollapseProject/filter-pushdown from CLONING it into
    # every consuming branch (measured: 12 ArrowEvalPython nodes in the
    # semdedup plan vs 5 with the clone-barrier — each clone is a full
    # Python re-evaluation of the same pairs)
    return _cos.asNondeterministic()


def cosine_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, vec_id, cosine, rank).

    queries: (query_id, embedding), small by contract (they ride a
    broadcast). The corpus side never shuffles: one Arrow mapInPandas
    pass scores every (query, vector) pair and keeps each Arrow batch's
    top-k per query, so only ~k·queries·batches rows reach the final
    per-query ranking window.

    Why a pandas UDF and not the Catalyst HOF expression: the
    ``cosine_expr`` aggregate/zip_with lambdas evaluate INTERPRETED per
    element — ~6 evals x 128 dims per pair (the winnowing lesson, the
    documented exception to 'UDFs are the slow path'). The NumPy kernel
    is BIT-IDENTICAL to the sequential Catalyst fold: ``cumsum(axis=1)``
    is a strict left-to-right summation (unlike np.dot's SIMD
    blocking), float32 -> float64 casts are exact, and the final
    ``dot / (na * nb)`` is the same scalar expression — so the DuckDB
    hash gates match unchanged (pytest-pinned equality vs cosine_expr).
    """
    spark = embeddings.sparkSession
    # ids keep their NATIVE Spark types end to end (same convention as
    # streaming/reservoir.py): object arrays for non-numeric ids, and
    # the output schema mirrors the inputs
    q_dt = queries.schema["query_id"].dataType.simpleString()
    v_dt = embeddings.schema["vec_id"].dataType.simpleString()
    q_rows = queries.select("query_id", "embedding").collect()
    qids = np.array([r["query_id"] for r in q_rows], dtype=object)
    qmat = np.array([r["embedding"] for r in q_rows], dtype=np.float64)
    # strict sequential sum-of-squares per query (bit-equal to the fold)
    qnorm = np.sqrt(np.cumsum(qmat * qmat, axis=1)[:, -1]) if len(q_rows) else None
    bc = spark.sparkContext.broadcast((qids, qmat, qnorm))

    def score(batches):
        ids, qm, qn = bc.value
        for pdf in batches:
            if not len(pdf) or not len(ids):
                continue
            x = np.array(list(pdf["embedding"]), dtype=np.float64)
            vec_ids = pdf["vec_id"].to_numpy(dtype=object)
            xnorm = np.sqrt(np.cumsum(x * x, axis=1)[:, -1])
            out_q, out_v, out_c = [], [], []
            for qi in range(len(ids)):
                dots = np.cumsum(x * qm[qi], axis=1)[:, -1]
                cos = dots / (xnorm * qn[qi])
                mask = vec_ids != ids[qi]
                v, c = vec_ids[mask], cos[mask]
                if len(c) > k:
                    # batch-local top-k by (cosine desc, vec_id asc):
                    # safe pre-prune — any global top-k row is in its
                    # batch's top-k under the same order
                    keep = np.lexsort((v, -c))[:k]
                    v, c = v[keep], c[keep]
                out_q.append(np.full(len(v), ids[qi]))
                out_v.append(v)
                out_c.append(c)
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "vec_id": np.concatenate(out_v),
                    "cosine": np.concatenate(out_c),
                }
            )

    scored = embeddings.select("vec_id", "embedding").mapInPandas(
        score, schema=f"query_id {q_dt}, vec_id {v_dt}, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ivf_train_centroids(
    embeddings: DataFrame,
    nlist: int = 16,
    sample: int = 4096,
    seed: int = 29,
    iters: int = 10,
) -> np.ndarray:
    """IVF coarse quantizer: seeded Lloyd's k-means on a deterministic
    sample, driver-side NumPy. IVF quantizers train on bounded samples
    even at 10^9 vectors (the index assigns distributedly); the sample
    is the top-``sample`` rows by hashed id — deterministic and
    engine-order-free. Vectors are L2-normalized so nearest-centroid
    ranks by cosine, matching the rerank metric."""
    rows = (
        embeddings.select("vec_id", "embedding")
        .orderBy(F.xxhash64("vec_id", F.lit(seed)))
        .limit(sample)
        .collect()
    )
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(nlist, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                cents[c] = v / max(np.linalg.norm(v), 1e-12)
    return cents.astype(np.float32)


def ivf_assign_udf(centroids: np.ndarray, spark, nprobe: int = 1):
    """Pandas UDF: embedding -> the ``nprobe`` nearest centroid ids
    (cosine). Centroids ride a broadcast, one matrix multiply per
    Arrow batch."""
    bc = spark.sparkContext.broadcast(centroids.astype(np.float32))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _assign(emb: pd.Series) -> pd.Series:
        c = bc.value
        x = np.vstack(emb.to_numpy()).astype(np.float32)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        sims = x @ c.T
        top = np.argsort(-sims, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(top))

    return _assign


def ivf_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 29,
) -> DataFrame:
    """IVF ANN top-k: coarse-quantize the corpus into ``nlist``
    inverted lists, probe each query against its ``nprobe`` nearest
    lists, exact-cosine rerank of candidates only — the second scale
    path beside SRP-LSH (brief: 'an IVF or LSH-bucketed variant').

    Plan shape at 100TB: the corpus carries one int cluster column
    (one pandas-UDF pass, no shuffle), the query x probe-list pairs are
    broadcast, and the candidate join touches only probed lists —
    corpus never shuffles, candidates ~ (nprobe/nlist) of the corpus.
    """
    spark = embeddings.sparkSession
    cents = ivf_train_centroids(embeddings, nlist=nlist, seed=seed)
    corpus = embeddings.withColumn(
        "cluster_id", ivf_assign_udf(cents, spark, nprobe=1)("embedding")[0]
    )
    qprobe = queries.withColumn(
        "probe", F.explode(ivf_assign_udf(cents, spark, nprobe=nprobe)("embedding"))
    ).select("query_id", F.col("embedding").alias("qe"), "probe")
    cand = corpus.join(
        F.broadcast(qprobe), F.col("cluster_id") == F.col("probe")
    ).where(F.col("query_id") != F.col("vec_id"))
    scored = cand.select(
        "query_id",
        "vec_id",
        cosine_pair_udf()(F.col("qe"), F.col("embedding")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_bits)).astype(np.float32)


def srp_signature_udf(dim: int, n_bits: int = 64, seed: int = 13):
    """Pandas UDF: embedding -> SRP signature (packed int64).

    Deterministic hyperplanes from the seed, so signatures computed on
    different executors (or different jobs) agree — required for
    resumable / incremental indexing.
    """
    planes = _hyperplanes(dim, n_bits, seed)

    @F.pandas_udf(T.LongType())
    def _sig(emb: pd.Series) -> pd.Series:
        mat = np.vstack(emb.to_numpy())  # (n, dim), Arrow gives ndarray cells
        bits = (mat @ planes) > 0
        packed = np.packbits(bits, axis=1, bitorder="little")
        return pd.Series(packed.copy().view(np.int64).ravel())

    return _sig


def srp_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_bits: int = 64,
    bands: int = 8,
    dim: int = 64,
    seed: int = 13,
) -> DataFrame:
    """ANN top-k: SRP signature -> band buckets -> exact rerank.

    Recall is tested against cosine_topk on the small SF; at scale the
    candidate join touches only bucket-mates (bands x 8-bit chunks).
    """
    if n_bits % 64 != 0:
        raise ValueError(
            f"n_bits must be a multiple of 64 (signatures pack into "
            f"int64 words); got {n_bits}"
        )
    if n_bits % bands != 0:
        raise ValueError(f"bands ({bands}) must divide n_bits ({n_bits})")
    sig = srp_signature_udf(dim, n_bits, seed)
    bits_per_band = n_bits // bands

    def banded(df: DataFrame, id_col: str) -> DataFrame:
        s = df.withColumn("_sig", sig(F.col("embedding")))
        return s.select(
            id_col,
            "embedding",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.shiftrightunsigned(F.col("_sig"), b * bits_per_band)
                            .bitwiseAND(F.lit((1 << bits_per_band) - 1))
                            .alias("v"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bv"),
        ).select(id_col, "embedding", F.col("bv.band").alias("band"), F.col("bv.v").alias("v"))

    eb = banded(embeddings, "vec_id").alias("e")
    qb = F.broadcast(banded(queries, "query_id")).alias("q")
    cand = (
        eb.join(qb, (F.col("e.band") == F.col("q.band")) & (F.col("e.v") == F.col("q.v")))
        .where(F.col("q.query_id") != F.col("e.vec_id"))
        .select(
            F.col("q.query_id").alias("query_id"),
            F.col("e.vec_id").alias("vec_id"),
            F.col("q.embedding").alias("qe"),
            F.col("e.embedding").alias("ee"),
        )
        .distinct()
    )
    scored = cand.select(
        "query_id", "vec_id", cosine_pair_udf()(F.col("qe"), F.col("ee")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
