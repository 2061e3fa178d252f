"""Distributed BPE tokenizer training and encoding (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units") —
the tokens-axis flagship a training-data pipeline needs beside token
COUNTING (operators/text.py): learn the merge table itself.

Scale shape (the part that matters at 100 TB): after ONE pass over the
corpus (explode words → groupBy count), training operates entirely on
the WORD-COUNT table — vocabulary-sized (10⁶–10⁸ distinct words), not
corpus-sized. Each merge round is:

- one shuffle: adjacent-pair counts weighted by word count,
- one single-row aggregate: the argmax pair (deterministic tie-break
  by (count, left, right) struct ordering — no global sort),
- one map-side rewrite of the symbol arrays (Arrow-batched pandas UDF
  over vocab rows; only rows containing both symbols are rewritten),

with a per-round localCheckpoint to cut the iterative lineage (swap
for checkpoint(dir) on a real cluster), exactly like
operators/components.py.

Training is iterative and data-dependent (each round's rewrite depends
on the previous argmax), so there is NO SQL-expressible oracle — the
driver records a rows-only check for its gate; correctness is pinned
by pytest equivalence against a sequential pure-Python reference BPE
(tests/test_bpe.py), the same naive-vs-optimized strategy the
reference repo uses for its bit-twiddling kernels.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prefix_filter_spark.sources.tokenizer import words_col

END = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, cnt) — the one corpus-sized pass; everything after is
    vocabulary-sized."""
    return (
        docs.select(F.explode(words_col(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )


def _initial_vocab(wc: DataFrame) -> DataFrame:
    """(cnt, syms) — each word as its character sequence + end marker."""
    chars = F.filter(F.split(F.col("w"), ""), lambda c: c != F.lit(""))
    return wc.select(
        "cnt", F.concat(chars, F.array(F.lit(END))).alias("syms")
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    pairs = F.transform(
        F.sequence(F.lit(0), F.size("syms") - 2),
        lambda i: F.struct(
            F.element_at("syms", i + 1).alias("a"),
            F.element_at("syms", i + 2).alias("b"),
        ),
    )
    return (
        vocab.where(F.size("syms") >= 2)
        .select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("total"))
    )


def _merge_udf(a: str, b: str):
    merged = a + b

    @F.pandas_udf("array<string>")
    def _merge(syms: pd.Series) -> pd.Series:
        out = []
        for s in syms:
            s = list(s)
            res = []
            i = 0
            n = len(s)
            while i < n:
                if i + 1 < n and s[i] == a and s[i + 1] == b:
                    res.append(merged)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            out.append(res)
        return pd.Series(out)

    return _merge


def train_bpe(
    docs: DataFrame, num_merges: int = 50, text_col: str = "text"
) -> list[tuple[str, str, int]]:
    """Learn the merge table: [(left, right, total_count), ...] in merge
    order. Deterministic: ties broken by (count, left, right) struct
    max — a pure function of the corpus, independent of partitioning.
    Stops early when no pair occurs twice."""
    vocab = _initial_vocab(word_counts(docs, text_col)).localCheckpoint(
        eager=True
    )
    # the per-round union of (touched, untouched) branches SUMS their
    # partition counts — without this coalesce the count doubles every
    # round (2^r tasks by round r); cap it at the session's shuffle
    # width (coalesce never raises a smaller layout, so this is purely
    # a ceiling — no extra shuffle)
    n_parts = int(
        docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        top = (
            _pair_counts(vocab)
            .agg(F.max(F.struct("total", "a", "b")).alias("m"))
            .collect()[0]["m"]
        )
        if top is None or top["total"] < 2:
            break
        a, b = top["a"], top["b"]
        merges.append((a, b, int(top["total"])))
        touched = F.array_contains("syms", a) & F.array_contains("syms", b)
        vocab = (
            vocab.where(touched)
            .select("cnt", _merge_udf(a, b)(F.col("syms")).alias("syms"))
            .unionByName(vocab.where(~touched))
            .coalesce(n_parts)
            .localCheckpoint(eager=True)
        )
    return merges


def encode_udf(merges: list[tuple[str, str, int]], spark):
    """Pandas UDF: text -> array<string> of BPE tokens. The ranked merge
    list rides a broadcast; encoding uses the classic lowest-rank-first
    algorithm with a per-batch word cache (words repeat a lot)."""
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    bc = spark.sparkContext.broadcast(ranks)

    @F.pandas_udf("array<string>")
    def _encode(text: pd.Series) -> pd.Series:
        r = bc.value
        cache: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            hit = cache.get(w)
            if hit is not None:
                return hit
            s = list(w) + [END]
            while len(s) >= 2:
                best = min(
                    range(len(s) - 1),
                    key=lambda i: r.get((s[i], s[i + 1]), 1 << 30),
                )
                if (s[best], s[best + 1]) not in r:
                    break
                s[best : best + 2] = [s[best] + s[best + 1]]
            cache[w] = s
            return s

        out = []
        for t in text:
            toks: list[str] = []
            for w in (t or "").lower().split(" "):
                if w:
                    toks.extend(enc_word(w))
            out.append(toks)
        return pd.Series(out)

    return _encode


def encode_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, bpe_tokens, n_bpe) — map-only encode pass."""
    spark = docs.sparkSession
    enc = encode_udf(merges, spark)
    return docs.select(
        "doc_id",
        enc(F.col(text_col)).alias("bpe_tokens"),
    ).withColumn("n_bpe", F.size("bpe_tokens"))
