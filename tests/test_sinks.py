"""Bucketed sink: joins and aggs between same-bucketed tables must plan
with zero Exchange (the pay-the-shuffle-once contract), and the data
must round-trip exactly."""

import pytest
from pyspark.sql import functions as F

from prefix_filter_spark.sources.sinks import read_bucketed, write_bucketed


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    toks = spark.range(20_000).select(
        F.col("id").alias("key"), (F.col("id") % 97).alias("n_tok")
    )
    dim = spark.range(0, 20_000, 4).select(
        F.col("id").alias("key"), F.lit("keep").alias("tag")
    )
    write_bucketed(toks, "t_toks", "key", 8, path=f"{tmp_path}/toks")
    write_bucketed(dim, "t_dim", "key", 8, path=f"{tmp_path}/dim")
    # the at-scale regime this sink exists for: both sides too big to
    # broadcast (at test size the planner would broadcast and skip the
    # bucketed scan entirely — "Bucketed: false (disabled by query
    # planner)" — hiding exactly the behavior under test)
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield read_bucketed(spark, "t_toks"), read_bucketed(spark, "t_dim")
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)
    spark.sql("DROP TABLE IF EXISTS t_toks")
    spark.sql("DROP TABLE IF EXISTS t_dim")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_join_is_shuffle_free(spark, bucketed_pair):
    toks, dim = bucketed_pair
    joined = toks.join(dim, "key")
    plan = _plan(joined)
    assert "Exchange" not in plan, plan
    assert joined.count() == 5_000


def test_groupby_on_bucket_key_is_shuffle_free(spark, bucketed_pair):
    toks, _ = bucketed_pair
    agg = toks.groupBy("key").agg(F.sum("n_tok").alias("s"))
    assert "Exchange" not in _plan(agg)
    assert agg.count() == 20_000


def test_roundtrip_exact(spark, bucketed_pair):
    toks, dim = bucketed_pair
    assert toks.count() == 20_000
    got = toks.agg(F.sum("n_tok")).collect()[0][0]
    want = sum(i % 97 for i in range(20_000))
    assert got == want


def test_plain_parquet_read_would_reshuffle(spark, bucketed_pair, tmp_path):
    """Negative control: reading the same files WITHOUT the catalog
    metadata plans an Exchange — the metadata, not the layout, is what
    Catalyst trusts."""
    toks, dim = bucketed_pair
    plain = spark.read.parquet(f"{tmp_path}/toks")
    plan = _plan(plain.join(dim, "key"))
    assert "Exchange" in plan
