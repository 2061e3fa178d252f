"""Deterministic tokenization: documents -> the BASELINE.json input_hint
shape ``(doc_id string, tokens array<int32>, n_tok int, source string)``.

Pure Catalyst expressions (split/transform/xxhash64) — no Python in the
path, fully codegen'd, reproducible across engines: the word split
(lowercase, single-space, drop empties) is mirrored 1:1 by DuckDB SQL in
the oracle queries (string_split + list_filter), and token ids are
``pmod(xxhash64(word, seed), vocab_size)`` which the oracles avoid
needing by operating on the word strings themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_VOCAB = 50_000
TOKEN_SEED = 42


def words_col(text_col="text"):
    """lowercase words, empties dropped — DuckDB mirror:
    list_filter(string_split(lower(text), ' '), w -> w <> '')"""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(F.lower(col), " "), lambda w: w != F.lit(""))


def token_ids_col(words, vocab_size: int = DEFAULT_VOCAB, seed: int = TOKEN_SEED):
    """words -> array<int32> token ids via seeded xxhash64 into a vocab."""
    return F.transform(
        words, lambda w: F.pmod(F.xxhash64(w, F.lit(seed)), F.lit(vocab_size)).cast("int")
    )


def tokenize_documents(
    docs: DataFrame, vocab_size: int = DEFAULT_VOCAB, seed: int = TOKEN_SEED
) -> DataFrame:
    """documents(doc_id,text,lang,source,...) -> tokenized-sequence table.

    Output schema == BASELINE.json input_hint:
    (doc_id string, tokens array<int32>, n_tok int, source string).
    """
    w = words_col("text")
    toks = token_ids_col(w, vocab_size, seed)
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        toks.alias("tokens"),
        F.size(toks).cast("int").alias("n_tok"),
        F.col("source").alias("source"),
    )


def exploded_tokens(tokenized: DataFrame) -> DataFrame:
    """(doc_id, token) stream — the u64-key stream equivalent of the
    reference's benchmark vectors (/root/reference/Tests/smart_tests.cpp:84-100)."""
    return tokenized.select(
        "doc_id", F.explode("tokens").alias("token")
    )
