"""Duplicated-span detection (exact-substring dedup, Lee et al. 2022).

Gates:
- spans on the synthetic corpus hash-match an independent DuckDB
  implementation (positions, extents, gram counts);
- hash_grams=True (the scale path's 8-byte shuffle key) produces the
  identical span set on this corpus;
- planted boilerplate across otherwise-unique docs is found with
  exact extents; a corpus of unique text yields zero spans;
- strip_duplicated_spans removes exactly the flagged words and
  nothing else, and a re-scan of the stripped corpus is span-free.
"""

import os

import duckdb
import pandas as pd
import pytest

from prefix_filter_spark.operators.span_dedup import (
    duplicated_spans,
    positional_kgrams,
    strip_duplicated_spans,
)

SF_DIR_MED = os.environ.get("SPARK_GRAFT_TEST_SF_DIR_MED", "/root/testdata/sf0.01")

K = 5
DUCK_WORDS = "list_filter(string_split(lower(text), ' '), x -> x <> '')"


def _oracle_spans(parquet_path: str, k: int = K, min_count: int = 2) -> pd.DataFrame:
    sql = f"""
    WITH toks AS (SELECT doc_id, {DUCK_WORDS} AS ws
                  FROM '{parquet_path}'),
    grams AS (
      SELECT doc_id, i - 1 AS pos, array_to_string(ws[i : i + {k - 1}], ' ') AS g
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - {k} + 2)) AS i
            FROM toks WHERE len(ws) >= {k})),
    dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= {min_count}),
    marked AS (SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dup)),
    isl AS (SELECT doc_id, pos,
                   pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
            FROM marked)
    SELECT doc_id, min(pos) AS start_pos, max(pos) + {k - 1} AS end_pos,
           count(*) AS n_grams
    FROM isl GROUP BY doc_id, grp
    ORDER BY doc_id, start_pos
    """
    return duckdb.sql(sql).df()


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.astype("int64")
    return pdf.sort_values(["doc_id", "start_pos"], ignore_index=True)


def test_spans_match_duckdb(documents_med):
    got = _norm(duplicated_spans(documents_med, k=K).toPandas())
    want = _norm(_oracle_spans(f"{SF_DIR_MED}/documents.parquet"))
    assert len(got) > 0, "synthetic corpus should contain duplicated passages"
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_hash_grams_scale_path_identical(documents_med):
    exact = _norm(duplicated_spans(documents_med, k=K).toPandas())
    hashed = _norm(duplicated_spans(documents_med, k=K, hash_grams=True).toPandas())
    pd.testing.assert_frame_equal(hashed[exact.columns], exact)


@pytest.fixture(scope="module")
def planted(spark):
    boiler = "this content is licensed under the synthetic license v2"
    rows = [
        (1, f"alpha beta gamma {boiler} delta epsilon"),
        (2, f"{boiler} zeta eta theta iota kappa"),
        (3, "unique words only here nothing repeats across documents ever"),
        (4, "short doc"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_planted_boilerplate_extents(planted):
    got = _norm(duplicated_spans(planted, k=K).toPandas())
    # boilerplate = 9 words -> 5 five-grams per occurrence, maximal runs
    want = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "start_pos": [3, 0],
            "end_pos": [11, 8],
            "n_grams": [5, 5],
        }
    ).astype("int64")
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_unique_corpus_has_no_spans(planted):
    unique = planted.where("doc_id >= 3")
    assert duplicated_spans(unique, k=K).count() == 0


def test_strip_removes_exactly_flagged_words(planted):
    spans = duplicated_spans(planted, k=K)
    out = (
        strip_duplicated_spans(planted, spans)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "clean_text"] == "alpha beta gamma delta epsilon"
    assert out.loc[2, "clean_text"] == "zeta eta theta iota kappa"
    assert int(out.loc[1, "n_words_dropped"]) == 9
    # untouched docs survive verbatim (modulo word normalization)
    assert out.loc[3, "clean_text"].startswith("unique words only")
    assert int(out.loc[3, "n_words_dropped"]) == 0
    assert int(out.loc[4, "n_words_kept"]) == 2


def test_stripped_corpus_is_span_free(planted, spark):
    spans = duplicated_spans(planted, k=K)
    clean = strip_duplicated_spans(planted, spans).select(
        "doc_id", pd_col("clean_text")
    )
    assert duplicated_spans(clean, k=K).count() == 0


def pd_col(name):
    from pyspark.sql import functions as F

    return F.col(name).alias("text")


def test_positional_kgrams_short_doc_empty(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    assert positional_kgrams(df, 5).count() == 0
    assert positional_kgrams(df, 3).count() == 1


def test_k_validation(planted):
    with pytest.raises(ValueError):
        duplicated_spans(planted, k=1)


def test_elect_canonical_one_per_group(planted):
    from prefix_filter_spark.operators.span_dedup import elect_canonical_spans

    spans = duplicated_spans(planted, k=K)
    elected = elect_canonical_spans(planted, spans).toPandas()
    # both occurrences carry the same content fingerprint
    assert elected["span_fp"].nunique() == 1
    per_group = elected.groupby("span_fp")["is_canonical"].sum()
    assert (per_group == 1).all()
    canon = elected[elected["is_canonical"]].iloc[0]
    assert (canon["doc_id"], canon["start_pos"]) == (1, 3)


def test_strip_non_canonical_keeps_one_copy(planted, spark):
    from prefix_filter_spark.operators.span_dedup import (
        strip_non_canonical_spans,
    )

    cleaned = strip_non_canonical_spans(planted, k=K)
    got = {r["doc_id"]: r for r in cleaned.collect()}
    # doc 1 is canonical: untouched; doc 2 loses exactly the 9 boiler words
    assert got[1]["n_words_dropped"] == 0
    assert got[2]["n_words_dropped"] == 9
    assert got[2]["clean_text"] == "zeta eta theta iota kappa"
    # unique docs pass through
    assert got[3]["n_words_dropped"] == 0 and got[4]["n_words_dropped"] == 0
    # the passage survives exactly once corpus-wide
    boiler = "this content is licensed under the synthetic license v2"
    n_copies = sum(boiler in r["clean_text"] for r in got.values())
    assert n_copies == 1


def test_canonical_preserves_every_duplicated_gram(planted, spark):
    from pyspark.sql import functions as F

    from prefix_filter_spark.operators.span_dedup import (
        strip_non_canonical_spans,
    )

    grams_before = positional_kgrams(planted, K)
    dup_grams = {
        r["g"]
        for r in grams_before.groupBy("g")
        .count()
        .where(F.col("count") >= 2)
        .collect()
    }
    cleaned = strip_non_canonical_spans(planted, k=K).selectExpr(
        "doc_id", "clean_text as text"
    )
    grams_after = {r["g"] for r in positional_kgrams(cleaned, K).collect()}
    assert dup_grams <= grams_after
