"""One-pass table profiling — ANALYZE-style per-column statistics
(count, nulls, distinct, min/max) for planning decisions: broadcast
eligibility, bucket counts, skew candidates, dictionary-encoding wins.
Composes with operators/join_stats.py (KMV pre-join cardinality): the
profile answers per-column questions, KMV answers cross-table ones.

Plan shape: ONE scan + ONE aggregate for the whole column list (all
stats are expressions in a single agg; Spark plans multi-column
count(distinct) via a single Expand — still one pass over the data),
then a map-side unpivot of the 1-row result. At 100 TB, profiling cost
equals one full scan regardless of how many columns are profiled.

``exact=False`` swaps count(distinct) for approx_count_distinct
(HLL++, ~2% error) — the scale default, since exact multi-column
distinct counts widen the Expand; the gate uses exact so DuckDB can
hash-match it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_profile(
    df: DataFrame, columns: list[str], exact: bool = True
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_value, max_value) —
    min/max rendered as strings so one schema covers every column type
    (cross-engine caveat: float rendering differs between engines; use
    numeric/string columns in oracle comparisons)."""
    ndv = F.countDistinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            ndv(c).alias(f"{c}__ndv"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"{c}__nn")).alias("n_nulls"),
                F.col(f"{c}__ndv").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
            for c in columns
        ]
    )
    return row.select(F.explode(per_col).alias("s")).select("s.*")
