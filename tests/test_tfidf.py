"""TF-IDF / BM25 scoring gates (operators/tfidf.py):

- doc_freqs == hand counts (distinct-per-doc semantics);
- BM25 == a hand-computed reference on a tiny corpus (same op order);
- full pipeline == a DuckDB twin over the real sf0.001 documents
  table at 1e-9 (logs are libm-dependent cross-engine, so tolerance
  not hashes — same reasoning as lm_perplexity's gate design);
- partition invariance: EXACT float equality across repartitionings
  (fixed term order + exact-integer avgdl make the plan a pure
  function of the data);
- plan shape: scoring is map-only (no exchange, no Python) once the
  two stats literals are folded in.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from prefix_filter_spark.operators.tfidf import (
    bm25_score,
    corpus_stats,
    doc_freqs,
    idf_for_terms,
    tfidf_score,
)

DOCS = [
    (0, "the fast join uses the hash table", "a"),
    (1, "slow scan of the big table", "a"),
    (2, "hash join hash join hash join", "b"),
    (3, "sort merge join", "b"),
]


def _df(spark, parts=3):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, source string"
    ).repartition(parts)


def _words(t):
    return [w for w in t.lower().split(" ") if w]


def test_doc_freqs_hand(spark):
    got = {r["w"]: r["df"] for r in doc_freqs(_df(spark)).collect()}
    want = {}
    for _, t, _s in DOCS:
        for w in set(_words(t)):
            want[w] = want.get(w, 0) + 1
    assert got == want
    assert got["join"] == 3 and got["hash"] == 2  # distinct-per-doc, not tf


def test_bm25_hand_reference(spark):
    terms = ["join", "hash", "missing"]
    k1, b = 1.2, 0.75
    n = len(DOCS)
    toks = sum(len(_words(t)) for _, t, _s in DOCS)
    avgdl = toks / n
    dfs = {"join": 3, "hash": 2, "missing": 0}
    idf = {
        t: math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5)) for t in terms
    }
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_score(_df(spark), terms, k1=k1, b=b).collect()
    }
    for doc_id, t, _s in DOCS:
        ws = _words(t)
        dl = float(len(ws))
        norm = k1 * (1.0 - b + b * dl / avgdl)
        want = 0.0
        for term in terms:  # same fixed order as the plan
            tf = float(ws.count(term))
            want = want + idf[term] * tf / (tf + norm)
        assert got[doc_id] == pytest.approx(want, rel=1e-12)
    # the all-repeats doc must outrank the single-mention docs on "hash
    # join" but saturate, not scale linearly with tf
    assert got[2] > got[0] > got[3]


def test_idf_floor_never_negative(spark):
    # "join" appears in 3/4 docs, "the" in 2/4: rarer term scores higher;
    # even a term in EVERY doc stays > 0 (the +1 floor)
    idf = idf_for_terms(_df(spark), ["the", "join", "zzz"])
    assert all(v > 0 for v in idf.values())
    assert idf["zzz"] > idf["the"] > idf["join"]


def test_partition_invariance_exact(spark):
    terms = ["join", "table", "scan"]
    a = {
        r["doc_id"]: r["bm25"]
        for r in bm25_score(_df(spark, 1), terms).collect()
    }
    b = {
        r["doc_id"]: r["bm25"]
        for r in bm25_score(_df(spark, 7), terms).collect()
    }
    assert a == b  # exact float equality, not approx


def test_tfidf_hand_reference(spark):
    terms = ["join", "hash"]
    n = 4
    dfs = {"join": 3, "hash": 2}
    got = {
        r["doc_id"]: r["tfidf"]
        for r in tfidf_score(_df(spark), terms).collect()
    }
    for doc_id, t, _s in DOCS:
        ws = _words(t)
        want = 0.0
        for term in terms:
            tf = ws.count(term)
            if tf > 0:
                want = want + (1.0 + math.log(float(tf))) * math.log(
                    n / dfs[term]
                )
        assert got[doc_id] == pytest.approx(want, rel=1e-12)


def test_duplicate_terms_rejected(spark):
    with pytest.raises(ValueError):
        bm25_score(_df(spark), ["join", "join"])
    with pytest.raises(ValueError):
        tfidf_score(_df(spark), [])


def test_scoring_plan_is_map_only(spark, documents):
    """Once the two stats literals are folded in, the scoring pass is a
    single map stage: no Exchange, no Python eval node."""
    df = bm25_score(documents, ["join", "hash"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bm25_matches_duckdb_twin(spark, documents):
    """Full pipeline vs an independent DuckDB implementation over the
    real sf0.001 documents table."""
    terms = ["join", "hash", "scan", "window"]
    k1, b = 1.2, 0.75
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_score(documents, terms, k1=k1, b=b).collect()
    }
    from tests.conftest import SF_DIR

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    terms_sql = ", ".join(f"'{t}'" for t in terms)
    rows = con.execute(f"""
        WITH w AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> x <> '') ws
          FROM documents),
        stats AS (
          SELECT count(*)::bigint AS n,
                 sum(len(ws))::bigint AS toks FROM w),
        dfs AS (
          SELECT t, count(DISTINCT doc_id) AS df
          FROM w, unnest(ws) AS u(t) WHERE t IN ({terms_sql}) GROUP BY t),
        idf AS (
          SELECT q.t, ln(1.0 + (s.n - coalesce(d.df, 0) + 0.5)
                               / (coalesce(d.df, 0) + 0.5)) AS idf
          FROM (SELECT unnest([{terms_sql}]) AS t) q
          LEFT JOIN dfs d USING (t) CROSS JOIN stats s)
        SELECT w.doc_id,
               sum(idf.idf * tf / (tf + {k1} * (1 - {b} + {b} * len(w.ws)::double
                                                / (s.toks::double / s.n)))) AS bm25
        FROM w CROSS JOIN stats s
        JOIN (SELECT doc_id, t, count(*)::double AS tf
              FROM w, unnest(ws) AS u(t) WHERE t IN ({terms_sql})
              GROUP BY doc_id, t) tfs ON w.doc_id = tfs.doc_id
        JOIN idf ON idf.t = tfs.t
        GROUP BY w.doc_id
    """).fetchall()
    want = {int(d): float(s) for d, s in rows}
    assert set(want) <= set(got)
    for d, s in want.items():
        assert got[d] == pytest.approx(s, abs=1e-9)
    # docs with NO query term: DuckDB's inner join drops them; Spark
    # must score them exactly 0
    for d in set(got) - set(want):
        assert got[d] == 0.0


# ------------------------------------------------- tokenizer fertility
def test_tokenizer_fertility_hand_and_both_encoders(spark):
    """Hand-checked on a tiny corpus; works over BOTH tokenizers'
    output shapes (BPE's flat array<string>, unigram's
    array<array<string>>) and is exactly partition-invariant."""
    from prefix_filter_spark.operators.bpe import encode_udf, train_bpe
    from prefix_filter_spark.operators.text import tokenizer_fertility
    from prefix_filter_spark.operators.unigram import (
        encode_unigram,
        train_unigram,
    )

    df = _df(spark)
    # hand case: a fake 2-tokens-per-word encoding
    import pyspark.sql.functions as F

    fake = df.withColumn(
        "tokens",
        F.flatten(
            F.transform(
                F.split(F.lower("text"), " "),
                lambda w: F.array(
                    F.substring(w, 1, 2), F.substring(w, 3, 100)
                ),
            )
        ),
    )
    got = {
        r["source"]: r
        for r in tokenizer_fertility(fake).collect()
    }
    # source a: docs 0+1 -> 7+6=13 words, 26 tokens -> fertility 2.0
    assert got["a"]["words"] == 13 and got["a"]["tokens"] == 26
    assert got["a"]["fertility"] == pytest.approx(2.0)
    # chars_per_token * tokens == total chars == sum word lengths
    total_chars = sum(
        len(w) for _, t, s in DOCS if s == "a" for w in _words(t)
    )
    assert got["a"]["chars_per_token"] * 26 == pytest.approx(total_chars)

    # both real encoders produce schema-valid, lossless-chars reports
    bpe_udf = encode_udf(train_bpe(df, num_merges=20), spark)
    bpe_enc = df.withColumn("tokens", bpe_udf(F.col("text")))
    uni_enc = encode_unigram(
        df, train_unigram(df, vocab_size=30, seed_size=50), out_col="tokens"
    )
    for enc in (bpe_enc, uni_enc):
        rows = {r["source"]: r for r in tokenizer_fertility(enc).collect()}
        for s in ("a", "b"):
            assert rows[s]["fertility"] >= 1.0  # >= one piece per word
    a = tokenizer_fertility(uni_enc.repartition(1)).collect()
    b = tokenizer_fertility(uni_enc.repartition(7)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
