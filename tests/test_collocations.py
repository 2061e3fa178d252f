"""PMI collocations: DuckDB cross-engine oracle (same formula over the
same word split), planted-collocation ranking, min_count filtering,
npmi range, and the degenerate one-bigram corpus."""

import duckdb
import pytest
from pyspark.sql import functions as F

from prefix_filter_spark.operators.collocations import pmi_collocations

_DUCK_WORDS = "list_filter(string_split(lower(text), ' '), x -> x <> '')"


def _corpus(spark):
    import random

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(23)]
    rows = []
    for i in range(200):
        # planted collocation: 'hong kong' always together; filler
        # words drawn INDEPENDENTLY per position (a deterministic
        # cyclic filler would itself be a set of perfect collocations)
        filler = " ".join(rng.choice(vocab) for _ in range(10))
        filler2 = " ".join(rng.choice(vocab) for _ in range(10))
        rows.append((i, f"{filler} hong kong {filler2}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_matches_duckdb_oracle(spark):
    docs = _corpus(spark)
    got = pmi_collocations(docs, min_count=3, top_k=50).toPandas()
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = con.execute(f"""
        WITH w AS (SELECT doc_id, {_DUCK_WORDS} ws FROM documents),
        bg AS (
          SELECT unnest(ws[1:len(ws)-1]) AS w1,
                 unnest(ws[2:len(ws)]) AS w2
          FROM w WHERE len(ws) >= 2),
        c AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2),
        l AS (SELECT w1, sum(c) AS c1 FROM c GROUP BY w1),
        r AS (SELECT w2, sum(c) AS c2 FROM c GROUP BY w2),
        n AS (SELECT sum(c)::DOUBLE AS n FROM c)
        SELECT w1, w2, c,
               round(log2(c * n.n / (c1 * c2)), 6) AS pmi,
               round(CASE WHEN c = n.n THEN 1.0
                          ELSE log2(c * n.n / (c1 * c2)) / -log2(c / n.n)
                     END, 6) AS npmi
        FROM c JOIN l USING (w1) JOIN r USING (w2), n
        WHERE c >= 3
        ORDER BY pmi DESC, w1, w2 LIMIT 50
    """).df()
    assert len(got) == len(want)
    gs = got.sort_values(["w1", "w2"]).reset_index(drop=True)
    ws = want.sort_values(["w1", "w2"]).reset_index(drop=True)
    assert gs["w1"].tolist() == ws["w1"].tolist()
    assert gs["w2"].tolist() == ws["w2"].tolist()
    assert gs["c"].tolist() == ws["c"].tolist()
    assert (gs["pmi"] - ws["pmi"]).abs().max() < 1e-9
    assert (gs["npmi"] - ws["npmi"]).abs().max() < 1e-9


def test_planted_collocation_ranks_first(spark):
    got = pmi_collocations(_corpus(spark), min_count=3, top_k=5).collect()
    assert (got[0]["w1"], got[0]["w2"]) == ("hong", "kong")
    assert got[0]["npmi"] > 0.9  # always-together pair: npmi near 1
    for r in got:
        assert -1.0 <= r["npmi"] <= 1.0


def test_min_count_filters_tail(spark):
    docs = _corpus(spark)
    lo = pmi_collocations(docs, min_count=1, top_k=10_000).count()
    hi = pmi_collocations(docs, min_count=100, top_k=10_000).count()
    assert hi < lo


def test_degenerate_single_bigram(spark):
    docs = spark.createDataFrame([(1, "a b"), (2, "a b")], "doc_id long, text string")
    got = pmi_collocations(docs, min_count=1).collect()
    assert len(got) == 1 and got[0]["npmi"] == 1.0


def test_empty_corpus(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert pmi_collocations(docs, min_count=1).count() == 0


def test_invalid_min_count(spark):
    with pytest.raises(ValueError):
        pmi_collocations(_corpus(spark), min_count=0)
