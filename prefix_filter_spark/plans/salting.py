"""Explicit skew handling: salted two-phase aggregation.

North rule: 'partitioning / shuffle / skew handled explicitly' — a hot
key (e.g. one `source` holding 50% of a 10^12-row corpus) would pin a
single reducer in a naive groupBy. The classic fix: phase 1 groups on
(key, salt) so the hot key fans out over ``salt_buckets`` reducers and
partial-aggregates; phase 2 combines the tiny per-salt partials.

The salt must be deterministic (resumable jobs re-salt identically):
we hash a uniquely-distributed column (or the whole row fallback) with
xxhash64 rather than rand().

Note Spark's own map-side partial aggregation already mitigates skew
for algebraic aggs when input partitions are key-mixed; salting is the
explicit, guaranteed form (and the required shape for the sketch
builders, whose per-group state is NOT reducible map-side by Catalyst).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(unique_col: Column | str, buckets: int, seed: int = 42) -> Column:
    col = F.col(unique_col) if isinstance(unique_col, str) else unique_col
    return F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(buckets)).cast("int")


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    salt_on: Column | str,
    phase1_aggs: list[Column],
    phase2_aggs: list[Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``phase1_aggs`` compute partials per (group, salt); ``phase2_aggs``
    combine partials per group. Column names must line up (alias the
    partials, reference them in phase 2).
    """
    salted = df.withColumn("_salt", salt_col(salt_on, salt_buckets))
    partial = salted.groupBy(*group_cols, "_salt").agg(*phase1_aggs)
    return partial.groupBy(*group_cols).agg(*phase2_aggs)


def salted_count(df: DataFrame, group_cols: list[str], salt_on, salt_buckets: int = 16) -> DataFrame:
    """Skew-safe count(*) per group — the canonical example."""
    return salted_agg(
        df,
        group_cols,
        salt_on,
        [F.count("*").alias("_partial_n")],
        [F.sum("_partial_n").alias("n")],
        salt_buckets,
    )
