"""Exact duplicated-span detection — substring-level dedup.

Doc-level dedup (``dedup.exact_duplicates``, MinHash-LSH, SimHash,
SemDeDup) drops whole near-identical documents; this operator finds
REPEATED PASSAGES *inside* otherwise-unique documents — the
license-header / boilerplate / templated-paragraph problem. Lee et
al. 2022 ("Deduplicating Training Data Makes Language Models Better",
the ExactSubstr dedup) solve it with a corpus-level suffix array; a
suffix array is a single-machine shape, so the Spark-first
re-expression uses the standard positional-k-gram reduction:

    a maximal duplicated span of >= k words is exactly a maximal run
    of word positions whose k-grams each occur >= min_count times in
    the corpus.

Plan shape (ONE shuffle on the gram key + one per-doc window):

1. posexplode word positions -> (doc_id, pos, gram) — map-side only;
2. duplicated grams = groupBy(gram) having count >= min_count — THE
   corpus shuffle. At scale pass ``hash_grams=True`` so the exchange
   moves 8-byte xxhash64 keys instead of strings; a 64-bit collision
   can only mark one extra k-gram duplicated (extending/merging a
   span), never lose one, and at 10^12 grams the expected number of
   colliding pairs is ~n^2/2^65 — documented, and the oracle gate
   runs with exact strings;
3. semi-join positions against the duplicated grams (AQE broadcasts
   the dup side when it is small);
4. gaps-and-islands per doc: ``pos - row_number() over (doc_id order
   by pos)`` groups consecutive duplicated positions; per-island
   min/max gives the maximal span [start_pos, end_pos] in word
   coordinates (end inclusive).

The window is partitioned by doc_id — state is bounded by a single
document's length, never global, so there is no single-task cliff
(contrast operators/ordering.py epoch_order's documented global
window). Reference scope note: the reference repo (TomerEven/
Prefix-Filter) has no text pipeline; this extends the engine's
training-data family alongside operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from prefix_filter_spark.sources.tokenizer import words_col


def positional_kgrams(docs: DataFrame, k: int) -> DataFrame:
    """Every word-position k-gram, position kept: (doc_id, pos, g).

    pos is the 0-based word index of the gram's FIRST word. Docs
    shorter than k words contribute nothing. Same word normalization
    as every other text operator (sources.tokenizer.words_col).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    # word array projected ONCE — slice(<words expr>, ...) inside the
    # transform lambda re-runs the tokenizer regexp per element,
    # O(len^2) per doc (see lm_score._bigrams)
    wsd = docs.select("doc_id", words_col("text").alias("_ws"))
    ws = F.col("_ws")
    grams = F.when(
        F.size(ws) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - k),
            lambda i: F.concat_ws(" ", F.slice(ws, i + 1, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return wsd.select("doc_id", F.posexplode(grams).alias("pos", "g"))


def duplicated_spans(
    docs: DataFrame,
    *,
    k: int = 5,
    min_count: int = 2,
    hash_grams: bool = False,
    seed: int = 0x5FA2,
) -> DataFrame:
    """Maximal duplicated word spans per doc.

    -> (doc_id, start_pos, end_pos, n_grams): every maximal run of
    word positions whose k-grams each appear >= min_count times
    corpus-wide (occurrences in the same doc count). start_pos/
    end_pos are 0-based inclusive word indices; n_grams is the number
    of duplicated k-grams merged into the span (span word length =
    end_pos - start_pos + 1 = n_grams + k - 1).

    ``hash_grams=True`` is the scale path: the gram shuffle key
    becomes xxhash64(g, seed) so the exchange and the dup-side state
    carry 8 bytes per gram instead of the string (see module
    docstring for the one-sided collision effect).
    """
    grams = positional_kgrams(docs, k)
    key = F.xxhash64("g", F.lit(seed)).alias("gk") if hash_grams else F.col("g").alias("gk")
    grams = grams.select("doc_id", "pos", key)
    dup = grams.groupBy("gk").count().where(F.col("count") >= min_count).select("gk")
    marked = grams.join(dup, "gk", "left_semi")
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = marked.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return (
        isl.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").alias("start_pos"),
            (F.max("pos") + F.lit(k - 1)).alias("end_pos"),
            F.count("*").alias("n_grams"),
        )
        .drop("grp")
    )


def strip_duplicated_spans(
    docs: DataFrame, spans: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """Remove every flagged span's words from each document.

    -> (doc_id, clean_text, n_words_kept, n_words_dropped). Word w at
    0-based index p survives iff no span [start_pos, end_pos] of its
    doc covers p; survivors are rejoined with single spaces in
    original order (word-level reconstruction — the same
    normalization loss as every words_col consumer).

    Policy note: this drops ALL occurrences of duplicated passages.
    Keep-one-canonical-copy is a doc-granular policy decision layered
    on top (see operators/components.py keep-lists); Lee et al. keep
    one occurrence, which at cluster scale needs a global
    canonical-occurrence election — out of scope for the word-level
    primitive.

    Plan: spans collapse to one interval-array row per doc (shuffle
    bounded by span count), broadcast-or-hash join back to docs, then
    a pure Catalyst filter over (word, index) pairs — per-word cost
    O(intervals-in-doc), no Python.
    """
    ivs = spans.groupBy("doc_id").agg(
        F.collect_list(
            F.array(
                F.col("start_pos").cast("bigint"), F.col("end_pos").cast("bigint")
            )
        ).alias("_ivs")
    )
    ws = words_col(text_col)
    out = (
        docs.join(ivs, "doc_id", "left")
        .withColumn("_ivs", F.coalesce("_ivs", F.array().cast("array<array<bigint>>")))
        .withColumn("_ws", ws)
        .withColumn(
            "_idx",
            F.when(
                F.size("_ws") > 0,
                F.sequence(F.lit(0), F.size("_ws") - 1).cast("array<bigint>"),
            ).otherwise(F.array().cast("array<bigint>")),
        )
        .withColumn(
            "_kept",
            F.filter(
                F.arrays_zip(F.col("_ws"), F.col("_idx")),
                lambda x: ~F.exists(
                    F.col("_ivs"),
                    lambda iv: (x["_idx"] >= iv[0]) & (x["_idx"] <= iv[1]),
                ),
            ),
        )
    )
    return out.select(
        "doc_id",
        F.concat_ws(" ", F.transform("_kept", lambda x: x["_ws"])).alias("clean_text"),
        F.size("_kept").alias("n_words_kept"),
        (F.size("_ws") - F.size("_kept")).alias("n_words_dropped"),
    )


def elect_canonical_spans(
    docs: DataFrame, spans: DataFrame, *, seed: int = 0x2C4A
) -> DataFrame:
    """Keep-one-copy election over duplicated spans (Lee et al. 2022
    keep semantics — the policy the strip_duplicated_spans docstring
    defers): spans are grouped by their exact WORD CONTENT, and the
    occurrence with the smallest (doc_id, start_pos) is canonical.

    -> spans columns + (span_fp long, is_canonical boolean). Feed the
    non-canonical rows to ``strip_duplicated_spans`` (see
    ``strip_non_canonical_spans``) to drop every duplicated passage
    EXCEPT its first occurrence.

    Scope: identical maximal spans dedup to one copy. Partially
    overlapping spans have different content, land in different
    groups, and are each their own canonical — deliberately
    conservative (never strips a passage that exists nowhere else
    verbatim).

    Plan: one join to re-slice span words from the doc (broadcast-or-
    hash, AQE decides), then ONE groupBy(span_fp) min-aggregation —
    map-side partial agg, so a boilerplate span occurring in 10^9 docs
    is a combiner-friendly hot key, not a single-task window (contrast
    a row_number() over span_fp, which would serialize that group).
    """
    wsd = docs.select("doc_id", words_col("text").alias("_ws"))
    length = F.col("end_pos") - F.col("start_pos") + 1
    sp = spans.join(wsd, "doc_id").withColumn(
        "span_fp",
        F.xxhash64(
            F.concat_ws(
                " ", F.slice("_ws", F.col("start_pos") + 1, length)
            ),
            F.lit(seed),
        ),
    ).drop("_ws")
    first = sp.groupBy("span_fp").agg(
        F.min(F.struct("doc_id", "start_pos")).alias("_first")
    )
    return (
        sp.join(first, "span_fp")
        .withColumn(
            "is_canonical",
            (F.col("doc_id") == F.col("_first.doc_id"))
            & (F.col("start_pos") == F.col("_first.start_pos")),
        )
        .drop("_first")
    )


def strip_non_canonical_spans(
    docs: DataFrame,
    *,
    k: int = 5,
    min_count: int = 2,
    hash_grams: bool = False,
    seed: int = 0x5FA2,
) -> DataFrame:
    """End-to-end ExactSubstr dedup with keep-one semantics:
    duplicated_spans -> elect_canonical_spans -> strip everything
    that is not the canonical occurrence.

    -> (doc_id, clean_text, n_words_kept, n_words_dropped) for EVERY
    input doc (docs with no duplicated spans pass through unchanged).
    Invariant (tested): a passage duplicated verbatim across N docs
    survives in exactly one of them — the smallest (doc_id,
    start_pos) — and every distinct duplicated k-gram still occurs
    somewhere in the cleaned corpus.
    """
    spans = duplicated_spans(
        docs, k=k, min_count=min_count, hash_grams=hash_grams, seed=seed
    )
    elected = elect_canonical_spans(docs, spans)
    drop = elected.filter(~F.col("is_canonical")).select(
        "doc_id", "start_pos", "end_pos", "n_grams"
    )
    return strip_duplicated_spans(docs, drop)
