"""Per-group sketch builds with explicit salted repartitioning.

The north-star shape: 'each executor builds per-partition filter/sketch
shards with explicit salted repartitioning for skewed `source` keys,
then tree-merges shards'. A naive groupBy(source).applyInPandas pins
the hot source (50% of a 10^12-row corpus) on one reducer; instead:

  phase 1: groupBy(source, salt) — the hot group fans out over
           ``salt_buckets`` reducers, each builds a partial sketch
           (vectorized pandas);
  phase 2: groupBy(source) merges the tiny partials (associative, so
           the fan-out is semantically free).

Works for every accumulator/merge pair in the library (HLL, CMS, KLL,
t-digest, Bloom-family via curried merges).
"""

from __future__ import annotations

import time
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prefix_filter_spark.plans.salting import salt_col

GROUP_SCHEMA = (
    "group string, state binary, n_rows long, n_partials long, build_ns long"
)


def sketch_by_group(
    df: DataFrame,
    group_col: str,
    value_col,
    *,
    acc_factory: Callable,
    merge_fn: Callable[[list[bytes]], bytes],
    salt_on: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """-> (group, state, n_rows, n_partials, build_ns) — one sketch per
    group, built skew-safely."""
    col = F.col(value_col) if isinstance(value_col, str) else value_col
    salted = df.select(
        F.col(group_col).alias("group"),
        col.alias("v"),
        salt_col(salt_on, salt_buckets).alias("_salt"),
    )

    def build_partial(pdf: pd.DataFrame) -> pd.DataFrame:
        t0 = time.perf_counter_ns()
        acc = acc_factory()
        acc.update(pdf["v"].to_numpy())
        return pd.DataFrame(
            {
                "group": [pdf["group"].iloc[0]],
                "state": [acc.to_bytes()],
                "n_rows": [len(pdf)],
                "n_partials": [1],
                "build_ns": [time.perf_counter_ns() - t0],
            }
        )

    partials = salted.groupBy("group", "_salt").applyInPandas(
        build_partial, schema=GROUP_SCHEMA
    )

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        t0 = time.perf_counter_ns()
        states = [bytes(s) for s in pdf["state"]]
        merged = merge_fn(states) if len(states) > 1 else states[0]
        return pd.DataFrame(
            {
                "group": [pdf["group"].iloc[0]],
                "state": [merged],
                "n_rows": [int(pdf["n_rows"].sum())],
                "n_partials": [len(states)],
                "build_ns": [int(pdf["build_ns"].sum()) + time.perf_counter_ns() - t0],
            }
        )

    return partials.groupBy("group").applyInPandas(merge_group, schema=GROUP_SCHEMA)
