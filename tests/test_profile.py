"""Table profiler (operators/profile.py)."""

from pyspark.sql import functions as F

from prefix_filter_spark.operators.profile import table_profile


def _df(spark):
    rows = [
        (1, "a", 10.0),
        (2, "b", None),
        (3, None, 30.0),
        (4, "a", 5.5),
        (5, "c", None),
    ]
    return spark.createDataFrame(rows, "id long, s string, v double")


def test_hand_computed_stats(spark):
    got = {
        r["column"]: (r["n_rows"], r["n_nulls"], r["n_distinct"],
                      r["min_value"], r["max_value"])
        for r in table_profile(_df(spark), ["id", "s", "v"]).collect()
    }
    assert got["id"] == (5, 0, 5, "1", "5")
    assert got["s"] == (5, 1, 3, "a", "c")
    assert got["v"] == (5, 2, 3, "5.5", "30.0")


def test_approx_mode_close_to_exact(spark):
    df = spark.range(20_000).select(
        F.col("id"), F.pmod(F.col("id"), F.lit(977)).alias("m")
    )
    exact = {r["column"]: r["n_distinct"]
             for r in table_profile(df, ["id", "m"], exact=True).collect()}
    approx = {r["column"]: r["n_distinct"]
              for r in table_profile(df, ["id", "m"], exact=False).collect()}
    assert exact == {"id": 20_000, "m": 977}
    for c in exact:
        assert abs(approx[c] - exact[c]) / exact[c] < 0.05, (c, approx[c])


def test_single_pass_plan(spark):
    """All columns profile in ONE aggregate over ONE scan — the plan
    must contain exactly one parquet scan."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        table_profile(docs, ["doc_id", "source", "n_chars"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan parquet") == 1, plan
    assert "BatchEvalPython" not in plan
