"""Bucketed-table sink: pay the shuffle once at write time, join free
forever after.

At 100 TB the dominant cost of a key join is the all-to-all exchange of
the fact table. Spark's Hive-style bucketing removes it: a table
written with ``bucketBy(n, key)`` is physically pre-partitioned (and
with ``sortBy`` pre-sorted) on the join key, and Catalyst plans joins
and aggregations between same-bucketed tables with ZERO Exchange nodes
(pytest-pinned in tests/test_sinks.py). This is the persisted twin of
``plans/sharding.py``'s in-flight hash routing — the pipeline shape the
north rule's "explicit salted repartitioning" calls for, amortized
across every downstream job that touches the table.

Notes that matter at scale:
- bucket count is a layout contract: both join sides must share it (or
  divide evenly, with ``spark.sql.bucketing.coalesceBucketsInJoin``);
  pick it like you pick shuffle partitions for the FINAL data size.
- bucketed tables require the session catalog (``saveAsTable``); an
  explicit ``path`` keeps the data external/self-contained while the
  catalog holds only the bucketing metadata.
- ``sortBy`` on the same key also deletes the Sort under sort-merge
  joins — worth it for fact tables joined repeatedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int,
    *,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed (and by default
    sorted) on ``bucket_col``. ``path`` makes it an external table."""
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucketing metadata (a plain
    ``spark.read.parquet(path)`` would lose it and re-shuffle)."""
    return spark.table(table)
