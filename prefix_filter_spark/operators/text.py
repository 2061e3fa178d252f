"""Text-analysis operators for training-data pipelines (driver brief):
token counting, quality scoring, language ID, document fingerprinting.

Everything except language-ID is pure Catalyst expressions (exact,
DuckDB-mirrorable for the correctness oracle). Language-ID is a
character-trigram centroid classifier trained on the corpus's own
labels — a self-contained pandas-UDF pipeline (no external models).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prefix_filter_spark.sources.tokenizer import words_col

# tiny function-word list used for the quality heuristic (public-domain
# stopwords; the synthetic corpus vocabulary includes 'the' and 'a')
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-doc token statistics — whitespace tokenization (exact)."""
    ws = words_col("text")
    return docs.select(
        "doc_id",
        "source",
        F.size(ws).alias("n_words"),
        F.col("n_chars").alias("n_chars"),
        (F.col("n_chars") / F.size(ws)).alias("chars_per_word"),
    )


# BPE-ish pre-tokenization split (GPT-2-style classes, no lookahead so
# Java regex (Spark) and RE2 (DuckDB) agree: leading-space word /
# number / punctuation runs, apostrophe suffixes)
BPE_SPLIT_RE = r"'[a-z]+| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+"


def bpe_token_stats(docs: DataFrame) -> DataFrame:
    """Per-doc token counts under a BPE-ish regex pre-tokenizer,
    alongside the whitespace count (driver brief: 'token counting
    (whitespace + a BPE-ish regex)'). Pure Catalyst
    (regexp_extract_all), exact and DuckDB-mirrorable — both engines'
    regex dialects are leftmost-first over these alternations."""
    ws = words_col("text")
    toks = F.regexp_extract_all(F.lower("text"), F.lit(BPE_SPLIT_RE), F.lit(0))
    return docs.select(
        "doc_id",
        "source",
        F.size(ws).alias("n_words"),
        F.size(toks).alias("n_bpe_tokens"),
    )


def tokenizer_fertility(
    encoded: DataFrame,
    tokens_col: str = "tokens",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-group tokenizer fertility report over an ENCODED corpus
    (the output of bpe.encode_bpe's flat token array, or
    unigram.encode_unigram's per-word arrays — any array or
    array-of-array column): tokens per word, chars per token, and the
    compression ratio vs whitespace words. The standard health check
    when fitting a tokenizer to a corpus mix (fertility >> 1.5 on a
    source usually means its text is out-of-domain for the vocab).

    Pure Catalyst, one groupBy; every ratio is a single division of
    exact integer sums (no float accumulation), so results are
    partition-invariant and DuckDB-mirrorable."""
    from pyspark.sql.types import ArrayType

    col = F.col(tokens_col)
    # array<array<string>> (per-word segmentations) flattens first
    dt = encoded.schema[tokens_col].dataType
    if isinstance(dt, ArrayType) and isinstance(dt.elementType, ArrayType):
        col = F.flatten(col)
    flat = col.cast("array<string>")
    ws = words_col(text_col)
    per_doc = encoded.select(
        F.col(group_col).alias("grp"),
        F.size(ws).alias("n_words"),
        F.size(flat).alias("n_tokens"),
        F.aggregate(
            flat, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
        ).alias("n_piece_chars"),
    )
    return (
        per_doc.groupBy(F.col("grp").alias(group_col))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("words"),
            F.sum("n_tokens").alias("tokens"),
            F.sum("n_piece_chars").alias("piece_chars"),
        )
        .select(
            group_col,
            "n_docs",
            "words",
            "tokens",
            (F.col("tokens").cast("double") / F.col("words")).alias(
                "fertility"
            ),
            (F.col("piece_chars").cast("double") / F.col("tokens")).alias(
                "chars_per_token"
            ),
        )
    )


def quality_exprs(text_col: str = "text") -> dict:
    """The quality-heuristic expressions as reusable Columns (ONE code
    path: quality_score's gate output and curation's map-only filter
    both come from here, so the threshold semantics can never drift)."""
    ws = words_col(text_col)
    n_words = F.size(ws)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(ws, lambda w: F.array_contains(stop_arr, w)))
    stop_ratio = n_stop / n_words
    mean_wlen = (
        F.aggregate(ws, F.lit(0).cast("double"), lambda acc, w: acc + F.length(w))
        / n_words
    )
    length_score = F.least(F.lit(1.0), n_words / F.lit(64.0))
    score = (
        F.lit(0.4) * length_score
        + F.lit(0.3) * F.least(F.lit(1.0), stop_ratio * 5.0)
        + F.lit(0.3) * F.least(F.lit(1.0), mean_wlen / 6.0)
    )
    return {
        "n_words": n_words,
        "stop_ratio": stop_ratio,
        "mean_word_len": mean_wlen,
        "quality": score,
    }


def quality_score(docs: DataFrame) -> DataFrame:
    """Deterministic quality heuristics: length score, stopword ratio,
    mean word length, combined score. Exact closed-form (oracle-able)."""
    q = quality_exprs("text")
    n_words, stop_ratio, mean_wlen, score = (
        q["n_words"],
        q["stop_ratio"],
        q["mean_word_len"],
        q["quality"],
    )
    return docs.select(
        "doc_id",
        "source",
        n_words.alias("n_words"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        F.round(score, 6).alias("quality"),
    )


def repetition_scores(docs: DataFrame) -> DataFrame:
    """Gopher-style intra-document repetition signals (Rae et al. 2021
    §A1.1: high duplicate-n-gram fractions mark boilerplate/spam):
    fraction of duplicate words, 2-grams, and 3-grams per doc.

    Pure Catalyst (map-only, zero shuffle, zero Python): dup_frac_n =
    1 - distinct_ngrams / total_ngrams, exactly mirrorable in the
    DuckDB oracle. Filter on these upstream of dedup — dropping a
    repetitive doc is cheaper than MinHashing it.
    """
    # project the word array ONCE — slice(<words expr>, ...) inside the
    # transform lambda re-runs the tokenizer regexp per element,
    # O(len^2) per doc (see lm_score._bigrams)
    docs = docs.select("doc_id", "source", words_col("text").alias("_ws"))
    ws = F.col("_ws")

    def ngrams(n: int):
        return F.when(
            F.size(ws) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(ws) - n),
                lambda i: F.concat_ws(" ", F.slice(ws, i + 1, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    def dup_frac(arr):
        return F.when(
            F.size(arr) > 0,
            F.lit(1.0) - F.size(F.array_distinct(arr)) / F.size(arr),
        ).otherwise(F.lit(0.0))

    return docs.select(
        "doc_id",
        "source",
        F.size(ws).alias("n_words"),
        F.round(dup_frac(ws), 6).alias("dup_word_frac"),
        F.round(dup_frac(ngrams(2)), 6).alias("dup_2gram_frac"),
        F.round(dup_frac(ngrams(3)), 6).alias("dup_3gram_frac"),
    )


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """Exact content fingerprint: md5 of the normalized word join.

    The exact-dedup key (operators.dedup.exact_duplicates); md5 is
    available in both Spark and DuckDB, so the oracle matches
    bit-for-bit.
    """
    ws = words_col("text")
    return docs.select(
        "doc_id", F.md5(F.concat_ws(" ", ws)).alias("fingerprint")
    )


def winnow_fingerprints(docs: DataFrame, k: int = 8, w: int = 16) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003): rolling char k-gram hashes over the normalized text,
    then the minimum hash of every length-w window, deduplicated —
    the driver brief's 'document fingerprinting (rolling hash)'.
    Plain-min tie rule (not robust winnowing), exact and deterministic.

    Arrow-batched pandas UDF, map-only (no shuffle): grams are 64-bit
    md5-prefix hex strings (so the DuckDB oracle computes identical
    fingerprints) and the window minima come from one vectorized
    NumPy sliding-window view per doc. A pure-Catalyst
    transform/slice/array_min formulation was tried first and measured
    40ms/doc — higher-order-function lambdas evaluate interpreted,
    per element, so the HOF version loses to Arrow+NumPy by ~50x here
    (the exception the 'UDFs are the slow path' rule allows for).
    """
    from pyspark.sql import types as T

    def run(batches):
        import hashlib

        for pdf in batches:
            out = []
            for t in pdf["text"]:
                norm = " ".join(x for x in (t or "").lower().split(" ") if x)
                n = len(norm)
                if n < k:
                    out.append([])
                    continue
                # grams as uint64 (big-endian first 8 md5 bytes):
                # numeric order == lexicographic order of the 16-char
                # hex prefix, and NumPy's min ufunc has no string loop
                grams = np.array(
                    [
                        int.from_bytes(
                            hashlib.md5(norm[i : i + k].encode()).digest()[:8],
                            "big",
                        )
                        for i in range(n - k + 1)
                    ],
                    dtype=np.uint64,
                )
                if len(grams) >= w:
                    sw = np.lib.stride_tricks.sliding_window_view(grams, w)
                    fps = np.unique(sw.min(axis=1))
                else:
                    fps = np.array([grams.min()], dtype=np.uint64)
                out.append([format(int(v), "016x") for v in fps])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "fingerprints": out,
                }
            )

    id_type = docs.schema["doc_id"].dataType.simpleString()
    return docs.select("doc_id", "source", "text").mapInPandas(
        run, schema=f"doc_id {id_type}, source string, fingerprints array<string>"
    )


def winnow_spans(
    docs: DataFrame, k: int = 8, w: int = 16, robust: bool = True
) -> DataFrame:
    """ROBUST winnowing with POSITIONS (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003, Fig. 5) — the variant ``winnow_fingerprints``'s
    docstring defers: where the value-only plain-min family suffices
    for set-overlap scoring, locating WHERE two documents overlap
    (plagiarism spans, boilerplate extents) needs (fingerprint, char
    offset) pairs, and then the selection rule matters:

    - keep the previously selected hash while it remains a minimum of
      the current window (no re-record as the window slides);
    - otherwise select the RIGHTMOST minimal hash.

    That rule makes the selected (value, relative-offset) sequence a
    function of local content alone, so two documents sharing a
    substring longer than w+k-1 select IDENTICAL fingerprints at
    IDENTICAL relative offsets inside the shared region (the paper's
    guarantee; pytest-pinned) — positions from a plain leftmost-min
    rule can diverge on equal-hash ties. ``robust=False`` gives the
    leftmost-min selection for comparison.

    -> (doc_id, source, spans array<struct<fp: string, pos: int>>).
    The selection loop is per-window sequential Python, dominated by
    the same per-gram md5 loop as winnow_fingerprints (one hash per
    character); expected density is 2/(w+1) selections per gram.
    """
    from pyspark.sql import types as T  # noqa: F401

    def run(batches):
        import hashlib

        for pdf in batches:
            out = []
            for t in pdf["text"]:
                norm = " ".join(x for x in (t or "").lower().split(" ") if x)
                n = len(norm)
                if n < k:
                    out.append([])
                    continue
                grams = np.array(
                    [
                        int.from_bytes(
                            hashlib.md5(norm[i : i + k].encode()).digest()[:8],
                            "big",
                        )
                        for i in range(n - k + 1)
                    ],
                    dtype=np.uint64,
                )
                m = len(grams)
                spans = []
                if m < w:
                    pos = (
                        m - 1 - int(np.argmin(grams[::-1]))
                        if robust
                        else int(np.argmin(grams))
                    )
                    spans.append((format(int(grams[pos]), "016x"), pos))
                else:
                    sel = -1
                    for r in range(m - w + 1):
                        window = grams[r : r + w]
                        wmin = window.min()
                        if robust and r <= sel < r + w and grams[sel] == wmin:
                            continue  # previous selection still minimal
                        if robust:
                            pos = r + (w - 1 - int(np.argmin(window[::-1])))
                        else:
                            pos = r + int(np.argmin(window))
                            if pos == sel:
                                continue
                        sel = pos
                        spans.append((format(int(grams[pos]), "016x"), pos))
                out.append(spans)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "spans": out,
                }
            )

    id_type = docs.schema["doc_id"].dataType.simpleString()
    return docs.select("doc_id", "source", "text").mapInPandas(
        run,
        schema=(
            f"doc_id {id_type}, source string, "
            "spans array<struct<fp: string, pos: int>>"
        ),
    )


def simhash64(docs: DataFrame, seed: int = 42) -> DataFrame:
    """64-bit SimHash over word hashes (Charikar 2002).

    Word hashing stays JVM-side (transform + xxhash64 inside Catalyst);
    the pandas UDF only does the vectorized bit-vote: unpack each
    word-hash to 64 bits, sum the +-1 votes per doc, sign -> signature.
    Near-duplicate docs differ in few signature bits.
    """
    from pyspark.sql import types as T

    word_hashes = F.transform(words_col("text"), lambda w: F.xxhash64(w, F.lit(seed)))

    @F.pandas_udf(T.LongType())
    def _vote(hashes: pd.Series) -> pd.Series:
        out = np.zeros(len(hashes), dtype=np.int64)
        for i, hs in enumerate(hashes):
            if hs is None or len(hs) == 0:
                continue
            u = np.asarray(hs, dtype=np.int64).view(np.uint64)
            bits = np.unpackbits(u.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
            votes = (2 * bits.astype(np.int32) - 1).sum(axis=0)
            sig = np.packbits((votes > 0).astype(np.uint8), bitorder="little")
            out[i] = int.from_bytes(sig.tobytes(), "little", signed=True)
        return pd.Series(out)

    return docs.select("doc_id", _vote(word_hashes).alias("simhash"))


# ---------------- language ID (self-trained trigram centroids) ---------
def _trigram_profile(texts: pd.Series, dim: int = 4096, seed: int = 7) -> np.ndarray:
    """(n, dim) L2-normalized hashed char-trigram count matrix."""
    from prefix_filter_spark.hashing import mix_with_seed

    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        if not t:
            continue
        b = t.encode("utf-8", "ignore")
        if len(b) < 3:
            continue
        a = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
        tri = a[:-2] * np.uint64(65536) + a[1:-1] * np.uint64(256) + a[2:]
        idx = (mix_with_seed(tri, seed) % np.uint64(dim)).astype(np.int64)
        counts = np.bincount(idx, minlength=dim).astype(np.float32)
        norm = np.linalg.norm(counts)
        if norm > 0:
            out[i] = counts / norm
    return out


def train_lang_centroids(docs: DataFrame, dim: int = 4096) -> dict[str, np.ndarray]:
    """Per-language mean trigram profile from the labeled corpus
    (distributed partial sums per partition, driver-side normalize)."""
    import pandas as pd

    def partial(batches):
        sums: dict[str, np.ndarray] = {}
        counts: dict[str, int] = {}
        for pdf in batches:
            profs = _trigram_profile(pdf["text"], dim)
            for lang in pdf["lang"].unique():
                m = (pdf["lang"] == lang).to_numpy()
                sums[lang] = sums.get(lang, np.zeros(dim, np.float32)) + profs[m].sum(0)
                counts[lang] = counts.get(lang, 0) + int(m.sum())
        rows = [
            {"lang": k, "vec": sums[k].tobytes(), "n": counts[k]} for k in sums
        ]
        if rows:
            yield pd.DataFrame(rows)

    parts = docs.select("lang", "text").mapInPandas(
        partial, schema="lang string, vec binary, n long"
    ).toPandas()
    centroids: dict[str, np.ndarray] = {}
    for lang, grp in parts.groupby("lang"):
        total = np.sum(
            [np.frombuffer(v, dtype=np.float32) for v in grp["vec"]], axis=0
        )
        norm = np.linalg.norm(total)
        centroids[str(lang)] = total / norm if norm > 0 else total
    return centroids


def predict_lang(docs: DataFrame, centroids: dict[str, np.ndarray]) -> DataFrame:
    """Nearest-centroid language prediction (vectorized pandas UDF)."""
    from pyspark.sql import types as T

    spark = docs.sparkSession
    langs = sorted(centroids)
    mat = np.stack([centroids[x] for x in langs])  # (L, dim)
    bc = spark.sparkContext.broadcast((langs, mat))

    @F.pandas_udf(T.StringType())
    def _pred(text: pd.Series) -> pd.Series:
        langs_, mat_ = bc.value
        profs = _trigram_profile(text, mat_.shape[1])
        sims = profs @ mat_.T
        return pd.Series([langs_[j] for j in sims.argmax(axis=1)])

    return docs.select("doc_id", "lang", _pred(F.col("text")).alias("lang_pred"))
