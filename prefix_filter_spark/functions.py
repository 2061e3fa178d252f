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
    return ContainsFunction(name, _contains, seed)


class ContainsFunction:
    def __init__(self, name: str, udf, seed: int):
        self.name = name
        self.udf = udf
        self.seed = seed

    def __call__(self, key: Column | str) -> Column:
        """contains(raw key column) — composes the JVM-side xxhash64."""
        return self.udf(hashed_key_col(key, self.seed))
