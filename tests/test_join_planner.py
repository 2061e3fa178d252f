"""Sketch-driven join planning (operators/join_planner.py): each
strategy fires on the workload shape built for it, and EVERY strategy
returns exactly the plain join's rows."""

import pytest
from pyspark.sql import functions as F

from prefix_filter_spark.operators.join_planner import plan_equi_join

from conftest import SF_DIR


@pytest.fixture(scope="module")
def fact(spark):
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    df = df.cache()
    df.count()
    return df


def _plain(fact, dim):
    return fact.join(dim, fact["l_orderkey"] == dim["o_orderkey"], "inner")


def _rows(df):
    return sorted(map(tuple, df.select("l_orderkey", "l_quantity", "o_orderkey").collect()))


def test_broadcast_for_small_dim(spark, fact):
    dim = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey"
    ).limit(100)
    out, dec = plan_equi_join(spark, fact, dim, "l_orderkey", "o_orderkey")
    assert dec.strategy == "broadcast"
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()
    assert _rows(out) == _rows(_plain(fact, dim))


def test_runtime_filter_for_selective_dim(spark, fact):
    # a selective dim: ~6% of order keys — force broadcast off with a
    # tiny row limit so the containment rule is what fires
    dim = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey"
    ).where(F.col("o_orderkey") % 16 == 0)
    out, dec = plan_equi_join(
        spark,
        fact,
        dim,
        "l_orderkey",
        "o_orderkey",
        broadcast_row_limit=10,
        rf_containment_max=0.5,
    )
    assert dec.strategy == "runtime_filter"
    assert dec.estimate.containment_a < 0.2
    assert _rows(out) == _rows(_plain(fact, dim))


def test_shuffle_for_full_overlap_dim(spark, fact):
    dim = spark.read.parquet(f"{SF_DIR}/orders.parquet").select("o_orderkey")
    out, dec = plan_equi_join(
        spark,
        fact,
        dim,
        "l_orderkey",
        "o_orderkey",
        broadcast_row_limit=10,  # force the broadcast guard off
        rf_containment_max=0.5,
    )
    assert dec.strategy == "shuffle"
    assert dec.estimate.containment_a > 0.9  # every fact key has an order
    assert _rows(out) == _rows(_plain(fact, dim))


def test_outer_join_never_runtime_filters(spark, fact):
    """Dropping non-matching fact rows is unsound for left joins — the
    planner must fall through to shuffle even at low containment."""
    dim = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey"
    ).where(F.col("o_orderkey") % 16 == 0)
    out, dec = plan_equi_join(
        spark,
        fact,
        dim,
        "l_orderkey",
        "o_orderkey",
        how="left",
        broadcast_row_limit=10,
    )
    assert dec.strategy == "shuffle"
    assert out.count() == fact.count()  # left join keeps every fact row
