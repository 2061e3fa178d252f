"""Sequence packing: the distributed prefix-sum must equal the exact
global-order cumsum for every bucketing, and pack assignment follows."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from prefix_filter_spark.operators.packing import pack_assignments, pack_summary


def _exact(pdf: pd.DataFrame, budget: int) -> pd.DataFrame:
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    pdf["tok_offset"] = pdf["n_tok"].cumsum().shift(1, fill_value=0).astype("int64")
    pdf["pack_id"] = pdf["tok_offset"] // budget
    return pdf


def _mk(spark, n=5_000, seed=0, parts=16, sparse=False):
    rng = np.random.default_rng(seed)
    ids = np.arange(n) * (37 if sparse else 1) + 5
    pdf = pd.DataFrame(
        {"doc_id": ids, "n_tok": rng.integers(1, 900, size=n).astype("int64")}
    )
    return spark.createDataFrame(pdf.sample(frac=1, random_state=1)).repartition(parts), pdf


def test_matches_exact_cumsum(spark):
    df, pdf = _mk(spark)
    got = (
        pack_assignments(df, "doc_id", "n_tok", budget=2048, num_buckets=13)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _exact(pdf, 2048)
    pd.testing.assert_frame_equal(got[["doc_id", "tok_offset", "pack_id"]],
                                  want[["doc_id", "tok_offset", "pack_id"]])


def test_bucket_count_invariance(spark):
    df, pdf = _mk(spark, n=2_000, seed=3, sparse=True)
    want = _exact(pdf, 500)[["doc_id", "tok_offset", "pack_id"]]
    for nb in (1, 7, 64):
        got = (
            pack_assignments(df, "doc_id", "n_tok", budget=500, num_buckets=nb)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[["doc_id", "tok_offset", "pack_id"]], want)


def test_pack_summary_consistency(spark):
    df, pdf = _mk(spark, n=3_000, seed=5)
    budget = 4096
    s = pack_summary(df, "doc_id", "n_tok", budget, num_buckets=8).toPandas()
    want = _exact(pdf, budget)
    grp = want.groupby("pack_id").agg(
        n_docs=("doc_id", "size"), n_tokens=("n_tok", "sum"),
        first_doc=("doc_id", "min"), last_doc=("doc_id", "max"),
    ).reset_index()
    got = s.sort_values("pack_id").reset_index(drop=True)
    assert (got["n_docs"].to_numpy() == grp["n_docs"].to_numpy()).all()
    assert (got["n_tokens"].to_numpy() == grp["n_tokens"].to_numpy()).all()
    assert (got["first_doc"].to_numpy() == grp["first_doc"].to_numpy()).all()
    assert (got["last_doc"].to_numpy() == grp["last_doc"].to_numpy()).all()
    # every pack id in [0, total_tokens // budget] occurs at most once and
    # doc ranges of consecutive packs never interleave
    assert got["pack_id"].is_unique
    assert (got["first_doc"].to_numpy()[1:] > got["last_doc"].to_numpy()[:-1]).all()


def test_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, n_tok long")
    out = pack_assignments(df, "doc_id", "n_tok", budget=100)
    assert out.count() == 0
    assert set(out.columns) == {"doc_id", "n_tok", "tok_offset", "pack_id"}


def test_no_global_window_in_plan(spark):
    """The scale contract: no single-task global sort window — the plan
    must show the bucket repartition + mapInPandas, not `Window`."""
    df, _ = _mk(spark, n=500)
    plan = pack_assignments(df, "doc_id", "n_tok", budget=100, num_buckets=4)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "MapInPandas" in plan


def test_grouped_packing_matches_per_group_cumsum(spark):
    """partition_col: packs computed independently per group — equal to
    the exact per-group cumsum, regardless of bucketing."""
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(4_000),
            "source": [f"s{i % 5}" for i in range(4_000)],
            "n_tok": rng.integers(1, 700, size=4_000).astype("int64"),
        }
    )
    df = spark.createDataFrame(pdf.sample(frac=1, random_state=2)).repartition(9)
    got = (
        pack_assignments(df, "doc_id", "n_tok", budget=1500, num_buckets=7,
                         partition_col="source")
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    want_parts = []
    for _, g in pdf.groupby("source"):
        g = g.sort_values("doc_id").copy()
        g["tok_offset"] = g["n_tok"].cumsum().shift(1, fill_value=0).astype("int64")
        g["pack_id"] = g["tok_offset"] // 1500
        want_parts.append(g)
    want = pd.concat(want_parts).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "tok_offset", "pack_id"]],
        want[["doc_id", "tok_offset", "pack_id"]],
    )
