"""Checkpointed, resumable sketch builds (north rule: 'resumable from
checkpointed per-partition sketch state with lineage and metrics logged
per partition').

Shard states are written as plain parquet (shard_id, state, n_keys,
input_rows, build_ns, sketch) — readable by any engine. Resume is
shard-granular: a re-run builds only the shards missing from the
checkpoint, by pruning the *input* with the same JVM-side shard-routing
expression used by the build (so the re-scan skips foreign shards'
rows before any shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prefix_filter_spark.plans.sharding import hashed_key_col, shard_col, widen_key_col


def save_shards(shards_df: DataFrame, path: str, mode: str = "overwrite") -> None:
    shards_df.write.mode(mode).parquet(path)


def load_shards(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(path)
    except Exception:  # noqa: BLE001 — path missing = no checkpoint yet
        return None


def build_or_resume(
    spark: SparkSession,
    df: DataFrame,
    key_col,
    *,
    seed: int,
    num_shards: int,
    build_fn,
    checkpoint_path: str,
) -> DataFrame:
    """Build a sharded sketch, resuming from ``checkpoint_path``.

    ``build_fn(df, key_col) -> shard rows`` is the sketch's normal build
    (build_bloom / build_prefix_filter partial-applied with its config).
    Completed shards are read back; only missing shards are rebuilt from
    an input pruned by the shard-routing predicate.
    """
    existing = load_shards(spark, checkpoint_path)
    if existing is None:
        built = build_fn(df, key_col)
        save_shards(built, checkpoint_path)
        return spark.read.parquet(checkpoint_path)

    done_ids = [r["shard_id"] for r in existing.select("shard_id").distinct().collect()]
    if len(done_ids) >= num_shards:
        return existing
    h = hashed_key_col(widen_key_col(df, key_col), seed)
    remaining = df.where(~shard_col(h, num_shards).isin(done_ids))
    rebuilt = build_fn(remaining, key_col)
    save_shards(rebuilt, checkpoint_path, mode="append")
    return spark.read.parquet(checkpoint_path)


def lineage_report(shards_df: DataFrame) -> DataFrame:
    """Per-shard lineage + metrics rollup (the reference's
    count_overflowing_PDs-style diagnostics, wrappers.hpp:743-764,
    generalized): rows in, distinct keys kept, build ns, state bytes."""
    return shards_df.select(
        "sketch",
        "shard_id",
        "input_rows",
        "n_keys",
        "build_ns",
        F.length("state").alias("state_bytes"),
    ).orderBy("shard_id")
