"""DSIR importance weighting (Xie et al. 2023) gates.

- per-doc fixed-point weights hash-match an independent DuckDB
  implementation exactly (integer equality, no float tolerance —
  that's the point of the RATIO_SCALE quantization);
- deterministic top-fraction selection matches the DuckDB window
  ranking;
- selecting with an English target corpus enriches English docs
  (the operator does what the paper says it does);
- the KLL-threshold approx path over-/under-selects only within the
  sketch's rank-error bound.
"""

import os

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from prefix_filter_spark.operators.dsir import (
    RATIO_SCALE,
    importance_weights,
    select_top_fraction,
)

SF_DIR_MED = os.environ.get("SPARK_GRAFT_TEST_SF_DIR_MED", "/root/testdata/sf0.01")
B = 10_000
W = "list_filter(string_split(lower(text), ' '), x -> x <> '')"


def _oracle_weights(parquet_path: str, target_pred: str) -> pd.DataFrame:
    sql = f"""
    WITH toks AS (SELECT doc_id, lang, {W} AS ws FROM '{parquet_path}'),
    feats AS (
      SELECT doc_id, lang, unnest(ws) AS w FROM toks
      UNION ALL
      SELECT doc_id, lang, array_to_string(ws[i : i + 1], ' ') AS w
      FROM (SELECT doc_id, lang, ws, unnest(range(1, len(ws))) AS i
            FROM toks WHERE len(ws) >= 2)),
    bucketed AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5(w), 1, 8))::UBIGINT % {B} AS BIGINT) AS bucket
      FROM feats),
    rcnt AS (SELECT bucket, count(*) AS cnt FROM bucketed GROUP BY bucket),
    tcnt AS (SELECT bucket, count(*) AS cnt FROM bucketed
             WHERE {target_pred} GROUP BY bucket),
    rtot AS (SELECT sum(cnt) AS total FROM rcnt),
    ttot AS (SELECT coalesce(sum(cnt), 0) AS total FROM tcnt),
    ratio AS (
      SELECT coalesce(r.bucket, t.bucket) AS bucket,
             CAST(round((coalesce(ln((t.cnt + 1)::DOUBLE / (ttot.total + {B})::DOUBLE),
                                  ln(1.0 / (ttot.total + {B})::DOUBLE))
                       - coalesce(ln((r.cnt + 1)::DOUBLE / (rtot.total + {B})::DOUBLE),
                                  ln(1.0 / (rtot.total + {B})::DOUBLE)))
                        * {RATIO_SCALE}) AS BIGINT) AS ratio_fp
      FROM rcnt r FULL OUTER JOIN tcnt t ON r.bucket = t.bucket, rtot, ttot),
    per_doc AS (
      SELECT b.doc_id, sum(ratio_fp) AS weight_fp, count(*) AS n_feats
      FROM bucketed b JOIN ratio USING (bucket) GROUP BY b.doc_id)
    SELECT d.doc_id,
           coalesce(weight_fp, 0) AS weight_fp,
           coalesce(n_feats, 0) AS n_feats
    FROM '{parquet_path}' d LEFT JOIN per_doc USING (doc_id)
    ORDER BY doc_id
    """
    return duckdb.sql(sql).df().astype("int64")


@pytest.fixture(scope="module")
def weights(spark, documents_med):
    target = documents_med.where(F.col("lang") == "en")
    return importance_weights(documents_med, target, n_buckets=B).cache()


def test_weights_match_duckdb(weights):
    got = (
        weights.toPandas()
        .astype("int64")
        .sort_values("doc_id", ignore_index=True)
    )
    want = _oracle_weights(f"{SF_DIR_MED}/documents.parquet", "lang = 'en'")
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_top_fraction_matches_duckdb(weights):
    got = (
        select_top_fraction(weights, 0.1)
        .toPandas()
        .astype("int64")
        .sort_values("doc_id", ignore_index=True)
    )
    want = _oracle_weights(f"{SF_DIR_MED}/documents.parquet", "lang = 'en'")
    m = max(1, -(-len(want) // 10))  # ceil(0.1 * n)
    want = (
        want.sort_values(["weight_fp", "doc_id"], ascending=[False, True])
        .head(m)
        .sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_selection_enriches_target_language(spark, weights, documents_med):
    sel = select_top_fraction(weights, 0.2).join(
        documents_med.select("doc_id", "lang"), "doc_id"
    )
    frac_en_sel = sel.where("lang = 'en'").count() / sel.count()
    frac_en_all = (
        documents_med.where("lang = 'en'").count() / documents_med.count()
    )
    assert frac_en_sel > frac_en_all + 0.15, (frac_en_sel, frac_en_all)


def test_approx_threshold_within_rank_error(weights):
    n = weights.count()
    sel = select_top_fraction(weights, 0.2, approx=True)
    # KLL k=200 -> rank error ~1.3%; allow 5% of n either way
    assert abs(sel.count() - 0.2 * n) <= 0.05 * n


def test_empty_doc_gets_zero_weight(spark):
    raw = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "")], "doc_id bigint, text string"
    )
    tgt = spark.createDataFrame([(1, "alpha beta")], "doc_id bigint, text string")
    out = (
        importance_weights(raw, tgt, n_buckets=64)
        .toPandas()
        .set_index("doc_id")
    )
    assert int(out.loc[2, "weight_fp"]) == 0
    assert int(out.loc[2, "n_feats"]) == 0
    assert int(out.loc[1, "n_feats"]) == 5  # 3 unigrams + 2 bigrams


def test_frac_validation(weights):
    with pytest.raises(ValueError):
        select_top_fraction(weights, 0.0)
