"""Product quantization: compressed embeddings + ADC similarity scan.

The ANN ladder in ``operators/similarity.py`` has three rungs —
exact brute force (``cosine_topk``), SRP-LSH bucketing, IVF inverted
lists. All three still carry the FULL float vector for every corpus
row they touch; at 10^10 x 64 float32 that is the dominant I/O cost of
every scan. Product quantization (Jegou-Douze-Schmid, TPAMI 2011 —
the compression layer under Faiss's IVF-PQ indexes) replaces each
vector with ``m`` one-byte codes: split the (L2-normalized) vector
into m subvectors, k-means each subspace into k<=256 codewords, store
the per-subspace nearest-codeword ids. 64 float32 = 256 bytes becomes
m=8 bytes — a 32x scan-size cut — and similarity is computed WITHOUT
decompressing, by asymmetric distance computation (ADC): per query,
precompute the (m, k) table of <q_sub, codeword> inner products, then
each corpus row's score is m table lookups summed. On unit vectors the
reconstruction inner product approximates cosine, and encoding by
subspace L2 minimizes exactly the reconstruction error that bounds the
score error (|<q, x> - <q, x_hat>| <= ||x - x_hat|| for unit q —
Cauchy-Schwarz; the pytest gate asserts this bound row-by-row).

Spark shapes (the point of the exercise):

- **train**: driver-side seeded Lloyd's per subspace on a bounded
  deterministic sample (top-``sample`` rows by hashed id) — the same
  bounded-sample contract as ``ivf_train_centroids``; codebooks are
  m*k*dsub floats (k=256, m=8, d=64 -> 64 KiB), broadcast everywhere.
- **encode**: one pandas-UDF projection, ZERO exchanges (plan-audited)
  — at 100 TB this is the map-only pass that writes the compressed
  mirror table next to the corpus.
- **adc_topk**: queries' LUTs ride a broadcast; the corpus streams
  through one mapInPandas with per-partition top-k, then a single
  window over ~(partitions x queries x k) candidate rows — the corpus
  itself NEVER shuffles (same plan shape as ``cosine_topk``, but the
  streamed bytes are m/(4*dim) of the exact scan).

Composition note: IVF-PQ = ``similarity.ivf_assign_udf`` cluster
column + this module's codes; probe lists with ADC scoring instead of
exact cosine, rerank the ADC top-k' with exact vectors. The pieces are
deliberately orthogonal; ``test_pq.py`` exercises the composition.

Reference scope: the reference repo (TomerEven/Prefix-Filter) has no
vector search; this extends the training-pipeline family (SURVEY §2.7)
beside similarity.py and dedup.py, reusing its "tiny broadcast state +
map-only scan" design rule.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class PqConfig:
    m: int = 8  # subspaces (bytes per code)
    k: int = 256  # codewords per subspace (<=256 so one byte each)
    sample: int = 4096  # training-sample bound (driver-side rows)
    seed: int = 101
    iters: int = 12

    def validate(self, dim: int) -> None:
        if self.m < 1 or dim % self.m != 0:
            raise ValueError(f"m={self.m} must divide dim={dim}")
        if not (2 <= self.k <= 256):
            raise ValueError(f"k={self.k} must be in [2, 256]")


def _normalize(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)


def pq_train_codebooks(
    embeddings: DataFrame, cfg: PqConfig = PqConfig()
) -> np.ndarray:
    """-> (m, k, dim//m) float32 codebooks.

    Seeded Lloyd's k-means independently per subspace over a bounded,
    deterministic, engine-order-free sample (top-``cfg.sample`` rows
    by xxhash64(vec_id, seed) — identical across partitionings, the
    ``ivf_train_centroids`` contract). Vectors are L2-normalized
    first so ADC inner products rank by cosine. Empty clusters keep
    their previous centroid (deterministic, no re-seeding)."""
    rows = (
        embeddings.select("vec_id", "embedding")
        .orderBy(F.xxhash64("vec_id", F.lit(cfg.seed)))
        .limit(cfg.sample)
        .collect()
    )
    x = _normalize(np.array([r["embedding"] for r in rows], dtype=np.float64))
    dim = x.shape[1]
    cfg.validate(dim)
    dsub = dim // cfg.m
    rng = np.random.default_rng(cfg.seed)
    books = np.empty((cfg.m, cfg.k, dsub), dtype=np.float64)
    for j in range(cfg.m):
        xs = x[:, j * dsub : (j + 1) * dsub]
        k = min(cfg.k, len(xs))
        cents = xs[rng.choice(len(xs), size=k, replace=False)].copy()
        for _ in range(cfg.iters):
            # L2 assignment via the ||x||^2 - 2<x,c> + ||c||^2 identity
            d2 = (cents * cents).sum(axis=1)[None, :] - 2.0 * (xs @ cents.T)
            assign = d2.argmin(axis=1)
            for c in range(k):
                sel = assign == c
                if sel.any():
                    cents[c] = xs[sel].mean(axis=0)
        if k < cfg.k:  # tiny sample: pad by repeating (never selected twice)
            cents = np.vstack([cents, np.repeat(cents[:1], cfg.k - k, axis=0)])
        books[j] = cents
    return books.astype(np.float32)


def _encode_batch(x: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, dim) float64 -> (n, m) uint8 nearest-codeword ids per subspace."""
    m, _, dsub = books.shape
    out = np.empty((len(x), m), dtype=np.uint8)
    for j in range(m):
        xs = x[:, j * dsub : (j + 1) * dsub]
        cb = books[j].astype(np.float64)
        d2 = (cb * cb).sum(axis=1)[None, :] - 2.0 * (xs @ cb.T)
        out[:, j] = d2.argmin(axis=1).astype(np.uint8)
    return out


def pq_encode_udf(books: np.ndarray, spark):
    """Pandas UDF: embedding -> m-byte PQ code (BinaryType). Codebooks
    ride one broadcast; one matrix multiply per subspace per Arrow
    batch. Map-only — composes into any projection without a shuffle."""
    bc = spark.sparkContext.broadcast(books)

    @F.pandas_udf(T.BinaryType())
    def _enc(emb: pd.Series) -> pd.Series:
        if not len(emb):
            return pd.Series([], dtype=object)
        x = _normalize(np.array(list(emb), dtype=np.float64))
        codes = _encode_batch(x, bc.value)
        return pd.Series([c.tobytes() for c in codes])

    return _enc


def pq_encode(
    embeddings: DataFrame, books: np.ndarray, *, code_col: str = "code"
) -> DataFrame:
    """-> embeddings with an m-byte ``code`` column (the compressed
    mirror). Plan: one ArrowEvalPython projection, zero exchanges."""
    spark = embeddings.sparkSession
    return embeddings.withColumn(code_col, pq_encode_udf(books, spark)("embedding"))


def pq_reconstruct(books: np.ndarray, codes: np.ndarray) -> np.ndarray:
    """(n, m) uint8 -> (n, dim) float64 reconstruction (test helper)."""
    m, _, dsub = books.shape
    out = np.empty((len(codes), m * dsub), dtype=np.float64)
    for j in range(m):
        out[:, j * dsub : (j + 1) * dsub] = books[j][codes[:, j]]
    return out


def pq_adc_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    cfg: PqConfig = PqConfig(),
    books: np.ndarray | None = None,
) -> DataFrame:
    """Compressed ANN top-k via asymmetric distance computation.

    -> (query_id, vec_id, adc_score, rank): per query the k corpus
    rows with the largest reconstruction inner product <q, x_hat>,
    rank 1..k, ties broken by vec_id ascending; self-pairs
    (query_id == vec_id) excluded like ``ivf_ann_topk``. adc_score is
    within ||x - x_hat||_2 of the true cosine for unit q (pytest-
    asserted bound), so it is the candidate stage of a two-stage scan:
    take ADC top-k' >> k, exact-rerank k' vectors (test_pq exercises
    the rerank composition; at 100 TB the rerank reads k' full vectors
    per query instead of the corpus).

    Plan: queries collect to the driver (queries are the SMALL side —
    same contract as cosine_topk's broadcast); each query becomes one
    (m, k) float32 LUT of <q_sub, codeword> products; LUTs broadcast;
    the corpus streams ONCE through mapInPandas (encode + LUT-gather,
    per-partition top-k), then one window over partitions*queries*k
    candidate rows. The corpus never shuffles and never leaves its
    m-byte codes after encode; with a pre-encoded mirror table pass
    ``pq_encode``'s output and the scan reads m bytes/row.
    """
    spark = embeddings.sparkSession
    if books is None:
        books = pq_train_codebooks(embeddings, cfg)
    q_rows = queries.select("query_id", "embedding").collect()
    qids = [r["query_id"] for r in q_rows]
    qx = _normalize(np.array([r["embedding"] for r in q_rows], dtype=np.float64))
    m, _, dsub = books.shape
    # LUT[qi, j, c] = <q_sub_j, codeword_jc>; scoring is a pure gather
    luts = np.einsum(
        "qjd,jcd->qjc", qx.reshape(len(qx), m, dsub), books.astype(np.float64)
    )
    bc = spark.sparkContext.broadcast((qids, luts, books))

    q_dt = queries.schema["query_id"].dataType.simpleString()
    v_dt = embeddings.schema["vec_id"].dataType.simpleString()

    def score(batches):
        qids_b, luts_b, books_b = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy()
            x = _normalize(np.array(list(pdf["embedding"]), dtype=np.float64))
            codes = _encode_batch(x, books_b)
            out_q, out_v, out_s = [], [], []
            cols = np.arange(m)
            for qi, qid in enumerate(qids_b):
                s = luts_b[qi][cols[None, :], codes].sum(axis=1)
                keep_mask = ids != qid
                v, sc = ids[keep_mask], s[keep_mask]
                if len(v) > k:
                    part = np.lexsort((v, -sc))[:k]
                    v, sc = v[part], sc[part]
                out_q.append(np.full(len(v), qid))
                out_v.append(v)
                out_s.append(sc)
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "vec_id": np.concatenate(out_v),
                    "adc_score": np.concatenate(out_s),
                }
            )

    scored = embeddings.select("vec_id", "embedding").mapInPandas(
        score, schema=f"query_id {q_dt}, vec_id {v_dt}, adc_score double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc_score"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
