"""Deterministic synthetic token-table generator (FIXTURES.md §1).

Produces the BASELINE.json input_hint shape directly from spark.range —
no external data, seed-stable across executors and runs (all columns
derive from xxhash64(id, seed_i) Catalyst expressions; no rand()).

- token ids: log-uniform ("zipf-ish", exponent ~1) over the vocab, so
  heavy hitters exist for CMS / heavy-hitter tests;
- `source`: skewed categorical — 'web' holds ~50% of rows (exercises
  the salted aggregation path, plans/salting.py);
- n_tok: 1..max_tokens, uniform.

This mirrors the reference's deterministic benchmark vectors
(/root/reference/Tests/smart_tests.cpp:84-100) lifted to the tokenized
document model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SOURCES = [("web", 0.50), ("books", 0.20), ("code", 0.15), ("wiki", 0.10), ("forums", 0.05)]


def _u01(col, seed: int):
    """Deterministic uniform [0,1) from a column."""
    return (F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(1 << 30)) / F.lit(float(1 << 30)))


def synthetic_documents(
    spark: SparkSession,
    n_docs: int,
    vocab_size: int = 50_000,
    max_tokens: int = 256,
    seed: int = 42,
) -> DataFrame:
    """(doc_id string, tokens array<int32>, n_tok int, source string)."""
    base = spark.range(n_docs)
    n_tok = (F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(max_tokens)) + 1).cast("int")
    # log-uniform token id: floor(vocab^u) - 1 clipped to [0, vocab)
    tok = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda i: F.least(
            F.lit(vocab_size - 1),
            (
                F.pow(F.lit(float(vocab_size)), _u01(F.col("id") * 100_003 + i, seed + 2))
                - 1
            ).cast("int"),
        ),
    )
    u_src = _u01(F.col("id"), seed + 3)
    # cumulative-bound when-chain: first matching (smallest) bound wins
    acc = 0.0
    expr = None
    for name, w in SOURCES:
        acc += w
        cond = u_src < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    src = expr.otherwise(F.lit(SOURCES[-1][0]))
    return base.select(
        F.format_string("doc-%012d", "id").alias("doc_id"),
        tok.alias("tokens"),
        F.size(tok).cast("int").alias("n_tok"),
        src.alias("source"),
    )


def exploded_token_stream(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", "source", F.explode("tokens").alias("token"))
