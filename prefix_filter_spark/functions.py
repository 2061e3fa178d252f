"""Registered Spark SQL surface over serialized sketch state.

Membership/estimate queries are exposed as vectorized pandas UDFs so a
user can write plain SQL, e.g.::

    SELECT count(*) FROM probes WHERE bf_contains(xxhash64(token, 42))

The UDFs take the 64-bit base hash column (``plans.sharding
.hashed_key_col``) rather than the raw key, so the hash stays JVM-side
and the Python worker only does the vectorized state probe. Helpers
returning composed Column expressions are provided for the common case.

Shard states ride to executors via a SparkContext broadcast — pickled
once per executor, not per task (pyspark_guide.md 'Pitfalls').
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from prefix_filter_spark.plans.sharding import hashed_key_col


import functools


# module-level (picklable by reference) cached state deserializers —
# the SQL quantile UDFs see the same blob on every row of a join
@functools.lru_cache(maxsize=64)
def _kll_cached(state: bytes):
    from prefix_filter_spark.sketches import kll

    return kll.KllSketch.from_bytes(state)


@functools.lru_cache(maxsize=64)
def _td_cached(state: bytes):
    from prefix_filter_spark.sketches import tdigest

    return tdigest.TDigest.from_bytes(state)


@functools.lru_cache(maxsize=64)
def _dds_cached(state: bytes):
    from prefix_filter_spark.sketches import dds

    return dds.DDSketch.from_bytes(state)


@functools.lru_cache(maxsize=64)
def _mg_cached(state: bytes):
    from prefix_filter_spark.sketches import mg

    return mg.estimates(state)  # (total, err, counts)


def register_contains_udf(
    spark: SparkSession, name: str, sketch, seed: int
) -> "ContainsFunction":
    """Register ``name(h bigint) -> boolean`` over a probe handle.

    ``sketch`` must expose ``contains_h(np.ndarray[u64]) -> bool array``
    (ShardedBloom, ShardedPrefixFilter, ...).
    """
    predecode = getattr(sketch, "predecode", None)
    if predecode is not None:
        predecode()  # pay header decode once, ship decoded tables
    bc = spark.sparkContext.broadcast(sketch)

    @F.pandas_udf(T.BooleanType())
    def _contains(h: pd.Series) -> pd.Series:
        s = bc.value
        return pd.Series(s.contains_h(h.to_numpy()))

    spark.udf.register(name, _contains)
    return ContainsFunction(name, _contains, seed, bc)


def register_lookup_udf(
    spark: SparkSession, name: str, retrieval, seed: int
) -> "LookupFunction":
    """Register ``name(h bigint) -> bigint`` over a ShardedRetrieval
    handle (sketches/retrieval.py): returns the stored value for every
    inserted key, an arbitrary hash-determined value for non-members
    (static-function contract). Same broadcast + Arrow-batch shape as
    register_contains_udf."""
    bc = spark.sparkContext.broadcast(retrieval)

    @F.pandas_udf(T.LongType())
    def _lookup(h: pd.Series) -> pd.Series:
        s = bc.value
        return pd.Series(s.lookup_h(h.to_numpy()))

    spark.udf.register(name, _lookup)
    return LookupFunction(name, _lookup, seed, bc)


class ContainsFunction:
    def __init__(self, name: str, udf, seed: int, broadcast=None):
        self.name = name
        self.udf = udf
        self.seed = seed
        # exposed so long-running drivers that re-register per epoch can
        # release the previous state (broadcast.unpersist()) instead of
        # pinning every generation on the executors
        self.broadcast = broadcast

    def __call__(self, key: Column | str, df=None) -> Column:
        """contains(raw key column) — composes the JVM-side xxhash64.

        Builds hash integral keys at bigint width (``plans.sharding
        .widen_key_col``); pass ``df`` (the frame the key column
        resolves against) so an int/smallint/tinyint probe column is
        widened the same way — without it a narrow integral column
        takes the JVM 4-byte hash kernel and every probe is a silent
        false negative. bigint and string probe columns need no df.
        """
        if df is not None:
            from prefix_filter_spark.plans.sharding import widen_key_col

            key = widen_key_col(df, key)
        return self.udf(hashed_key_col(key, self.seed))


class LookupFunction(ContainsFunction):
    """Same wrapper + broadcast-lifecycle contract as ContainsFunction;
    the registered UDF returns the stored bigint value instead of a
    boolean."""


def register_sketch_sql(spark: SparkSession) -> None:
    """Register the estimate surface over serialized sketch state, so a
    shard-state table is queryable with plain SQL (SURVEY.md M3):

        SELECT hll_estimate(state) FROM hll_shards
        SELECT cms_point(state, token) FROM cms_shards, probe_tokens
        SELECT kll_quantile(state, 0.5), tdigest_quantile(state, 0.99) ...

    All pandas UDFs (Arrow-batched); states are small binary blobs, so
    the per-row deserialize cost is amortized by an LRU cache keyed on
    the full state bytes (states repeat across rows in a join).
    """
    from prefix_filter_spark.sketches import cms, hll

    @F.pandas_udf(T.DoubleType())
    def hll_estimate(state: pd.Series) -> pd.Series:
        return state.map(lambda s: hll.estimate(bytes(s)) if s is not None else None)

    @F.pandas_udf(T.LongType())
    def cms_point(state: pd.Series, key: pd.Series) -> pd.Series:
        import numpy as np

        out = np.zeros(len(state), dtype=object)
        if len(state):
            # group rows by identical state blob, probe each group batch;
            # NULL states (e.g. left joins against a sparse state table)
            # yield NULL like the other sketch UDFs, not a TypeError
            groups: dict[bytes, list[int]] = {}
            for i, s in enumerate(state):
                if s is None:
                    out[i] = None
                else:
                    groups.setdefault(bytes(s), []).append(i)
            for blob, idxs in groups.items():
                ks = key.iloc[idxs].to_numpy()
                for j, v in zip(idxs, cms.point_estimates(blob, ks)):
                    out[j] = int(v)
        return pd.Series(out)

    def _grouped_quantile(cache):
        """Group rows by identical state blob, evaluate the whole
        quantile vector per group via the sketch's vectorized
        ``quantiles`` (one weighted-items/centroid walk per blob
        instead of one per ROW) — same shape as cms_point above.
        NULL states yield NULL."""

        def run(state: pd.Series, q: pd.Series) -> pd.Series:
            import numpy as np

            out = np.empty(len(state), dtype=object)
            groups: dict[bytes, list[int]] = {}
            for i, s in enumerate(state):
                if s is None:
                    out[i] = None
                else:
                    groups.setdefault(bytes(s), []).append(i)
            for blob, idxs in groups.items():
                vals = cache(blob).quantiles(q.iloc[idxs].to_numpy(dtype=np.float64))
                for j, v in zip(idxs, vals):
                    out[j] = float(v)
            return pd.Series(out)

        return run

    kll_quantile = F.pandas_udf(T.DoubleType())(_grouped_quantile(_kll_cached))
    tdigest_quantile = F.pandas_udf(T.DoubleType())(_grouped_quantile(_td_cached))
    dds_quantile = F.pandas_udf(T.DoubleType())(_grouped_quantile(_dds_cached))

    @F.pandas_udf(T.DoubleType())
    def kll_rank(state: pd.Series, v: pd.Series) -> pd.Series:
        """Approximate CDF: fraction of sketched values <= v (rank
        error +-eps like the quantile direction). The selectivity
        estimator behind range-scan planning: P(lo <= x <= hi) =
        kll_rank(state, hi) - kll_rank(state, lo-)."""
        out = []
        for s, x in zip(state, v):
            if s is None or x is None:
                out.append(None)
            else:
                out.append(float(_kll_cached(bytes(s)).rank(float(x))))
        return pd.Series(out, dtype=object)

    from prefix_filter_spark.sketches import kmv

    @F.pandas_udf(T.DoubleType())
    def kmv_estimate(state: pd.Series) -> pd.Series:
        return state.map(lambda s: kmv.estimate(bytes(s)) if s is not None else None)

    def _kmv_pairwise(op):
        """Binary set expression over two state columns (e.g. the
        sketches of two crawl snapshots joined side by side)."""

        def run(sa: pd.Series, sb: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    op(bytes(a), bytes(b)) if a is not None and b is not None else None
                    for a, b in zip(sa, sb)
                ],
                dtype=object,
            )

        return run

    kmv_union = F.pandas_udf(T.DoubleType())(_kmv_pairwise(kmv.union_estimate))
    kmv_intersection = F.pandas_udf(T.DoubleType())(
        _kmv_pairwise(kmv.intersection_estimate)
    )
    kmv_difference = F.pandas_udf(T.DoubleType())(
        _kmv_pairwise(kmv.difference_estimate)
    )
    kmv_jaccard = F.pandas_udf(T.DoubleType())(_kmv_pairwise(kmv.jaccard_estimate))

    @F.pandas_udf(T.LongType())
    def mg_estimate(state: pd.Series, token: pd.Series) -> pd.Series:
        """Lower-bound count for a token (0 when absent — the MG lower
        bound for any token outside the summary)."""
        out = []
        for s, t in zip(state, token):
            if s is None or t is None:
                out.append(None)
            else:
                out.append(_mg_cached(bytes(s))[2].get(t, 0))
        return pd.Series(out, dtype=object)

    @F.pandas_udf(T.LongType())
    def mg_error(state: pd.Series) -> pd.Series:
        return state.map(lambda s: _mg_cached(bytes(s))[1] if s is not None else None)

    @F.pandas_udf(T.LongType())
    def mg_total(state: pd.Series) -> pd.Series:
        return state.map(lambda s: _mg_cached(bytes(s))[0] if s is not None else None)

    spark.udf.register("mg_estimate", mg_estimate)
    spark.udf.register("mg_error", mg_error)
    spark.udf.register("mg_total", mg_total)

    spark.udf.register("hll_estimate", hll_estimate)
    spark.udf.register("cms_point", cms_point)
    spark.udf.register("kll_quantile", kll_quantile)
    spark.udf.register("kll_rank", kll_rank)
    spark.udf.register("tdigest_quantile", tdigest_quantile)
    spark.udf.register("dds_quantile", dds_quantile)
    spark.udf.register("kmv_estimate", kmv_estimate)
    spark.udf.register("kmv_union", kmv_union)
    spark.udf.register("kmv_intersection", kmv_intersection)
    spark.udf.register("kmv_difference", kmv_difference)
    spark.udf.register("kmv_jaccard", kmv_jaccard)


def register_state_contains(spark: SparkSession, name: str = "bf_state_contains"):
    """SQL membership over a STATE COLUMN: ``bf_state_contains(state,
    h)`` probes each row's serialized Bloom state (seed read from the
    state header) with the base-hash value ``h`` — no driver handle,
    so any TABLE of states is queryable in plain SQL, e.g. the
    per-file data-skipping index::

        SELECT file FROM file_index
        WHERE bf_state_contains(state, xxhash64(CAST(42 AS BIGINT), 42))

    Row-at-a-state but Arrow-batched across rows; intended for
    state-table scale (one row per file/shard), not per-key scans —
    key-column probes belong to register_contains_udf.
    """
    from prefix_filter_spark.sketches import bloom

    @F.pandas_udf(T.BooleanType())
    def _state_contains(state: pd.Series, h: pd.Series) -> pd.Series:
        import numpy as np

        out = [
            bool(bloom.contains_h_in_state(bytes(s), np.array([v]))[0])
            for s, v in zip(state, h)
        ]
        return pd.Series(out)

    spark.udf.register(name, _state_contains)
    return _state_contains


def probe_keys_local(handle, keys) -> "pd.Series":
    """Driver-side membership probe: ZERO Spark jobs.

    ``handle`` is any collected sharded handle exposing ``contains_h``
    and a ``cfg.seed`` (ShardedBloom / ShardedPrefixFilter /
    ShardedXor / …); ``keys`` are raw integer or string keys, hashed
    with the NumPy/Python twins of the build-side JVM expression
    (``hashing.spark_xxhash64_long`` / ``_str``, JVM-equality
    pytest-pinned). The batch analogue of the reference's single-key
    ``Contain`` (/root/reference/Tests/wrappers.hpp:648-659) for
    needle checks: a blocklist lookup or debugging probe should not
    cost a cluster round-trip.
    """
    import numpy as np

    from prefix_filter_spark.hashing import (
        spark_xxhash64_long,
        spark_xxhash64_str,
    )

    keys = list(keys)
    seed = handle.cfg.seed
    if not keys:
        return pd.Series(np.empty(0, dtype=bool), index=[])
    if all(isinstance(k, (int, np.integer)) for k in keys):
        h = spark_xxhash64_long(np.array(keys, dtype=np.int64), seed)
    elif all(isinstance(k, str) for k in keys):
        h = spark_xxhash64_str(keys, seed)
    else:
        raise TypeError(
            "probe_keys_local needs all-int or all-str keys; mixed or "
            "other types must go through the SQL UDF path"
        )
    return pd.Series(handle.contains_h(h), index=keys)
