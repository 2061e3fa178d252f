"""Unigram-LM tokenizer training and encoding (Kudo 2018, "Subword
Regularization: Improving Neural Network Translation Models with
Multiple Subword Candidates" — the SentencePiece unigram model), the
second trainable tokenizer on the tokens axis beside BPE
(operators/bpe.py). BPE grows a vocabulary bottom-up by merging; the
unigram model starts from a LARGE seed vocabulary and prunes it down,
fitting piece probabilities by EM over all segmentations.

Scale shape (same regime as BPE training): after ONE corpus-sized pass
(explode words -> groupBy count), everything operates on the
WORD-COUNT table — vocabulary-sized (10^6–10^8 distinct words), never
corpus-sized. Each EM iteration is:

- E-step: an Arrow-batched pandas UDF over (word, cnt) rows runs
  forward-backward over the word's segmentation lattice against the
  BROADCAST piece table and emits per-piece expected counts;
- M-step: explode + groupBy(piece) sum — one shuffle whose row count
  is bounded by distinct_words x pieces_per_word — then the new
  piece table (vocab-sized, ~10^5 rows x ~20 B) comes back to the
  driver, the same bounded driver-fold pattern as sequence packing's
  per-bucket offsets (operators/packing.py) and BPE's argmax row.

Determinism across partitionings (the repo-wide gate requirement, cf.
the lm_perplexity float-avg review finding): expected counts are
QUANTIZED to integer fixed-point (``FP`` units) per (word, piece)
BEFORE the M-step sum, so the reduction is an exact integer sum —
commutative, associative, partition-invariant — and the new log-probs
are recomputed on the driver from those integers. The whole training
run is therefore a pure function of the word-count table
(``test_unigram.py`` pins repartition invariance and equality with a
sequential pure-Python reference driver).

Simplification vs the paper, documented: pruning keeps the
highest-expected-count pieces (single characters always survive, so
any word stays encodable) instead of the paper's likelihood-loss
ranking; the EM fit itself is the paper's full soft EM (the E-step is
forward-backward over ALL segmentations, verified in tests against
brute-force segmentation enumeration), not hard Viterbi counts.

Reference scope note: the reference repo (TomerEven/Prefix-Filter) has
no tokenizer; this extends the engine's tokens-axis family alongside
operators/bpe.py.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prefix_filter_spark.operators.bpe import word_counts

# fixed-point scale for expected counts: 1e6 units per occurrence.
# At 10^12 corpus tokens the total across all pieces is ~10^18 < 2^63;
# ANSI mode (session default) turns a hypothetical overflow into an
# error instead of a silent wrap.
FP = 1_000_000


# ----------------------------------------------------------------- math
def _log_add(a: float, b: float) -> float:
    if a == -math.inf:
        return b
    if b == -math.inf:
        return a
    hi, lo = (a, b) if a >= b else (b, a)
    return hi + math.log1p(math.exp(lo - hi))


def forward_backward_counts(
    word: str, logp: dict[str, float], max_len: int
) -> tuple[dict[str, float], float]:
    """Expected piece-occurrence counts for ONE word under the unigram
    model, and the word's log marginal likelihood. Pure function —
    shared by the executor UDF and the sequential reference driver in
    tests, and itself pinned against brute-force segmentation
    enumeration (test_unigram.py).

    alpha[i] = log sum of path weights over segmentations of w[:i];
    beta[i] likewise for w[i:]; the posterior expected count of the
    piece at span [j, i) is exp(alpha[j] + logp + beta[i] - alpha[n]).
    Returns ({}, -inf) when the word is unsegmentable (a character
    missing from the piece set — cannot happen when single chars are
    retained, which training guarantees)."""
    n = len(word)
    alpha = [-math.inf] * (n + 1)
    alpha[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            lp = logp.get(word[j:i])
            if lp is not None and alpha[j] != -math.inf:
                alpha[i] = _log_add(alpha[i], alpha[j] + lp)
    z = alpha[n]
    if z == -math.inf:
        return {}, -math.inf
    beta = [-math.inf] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        for j in range(i + 1, min(n, i + max_len) + 1):
            lp = logp.get(word[i:j])
            if lp is not None and beta[j] != -math.inf:
                beta[i] = _log_add(beta[i], lp + beta[j])
    out: dict[str, float] = {}
    for j in range(n):
        for i in range(j + 1, min(n, j + max_len) + 1):
            lp = logp.get(word[j:i])
            if lp is not None and alpha[j] != -math.inf and beta[i] != -math.inf:
                e = math.exp(alpha[j] + lp + beta[i] - z)
                if e > 0.0:
                    p = word[j:i]
                    out[p] = out.get(p, 0.0) + e
    return out, z


def viterbi_encode_word(
    word: str, logp: dict[str, float], max_len: int
) -> list[str]:
    """Best segmentation of one word: max total log-prob, ties broken
    toward the LONGEST piece at each boundary (smallest j), so the
    output is a deterministic pure function of (word, piece table)."""
    n = len(word)
    best = [-math.inf] * (n + 1)
    back = [-1] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            lp = logp.get(word[j:i])
            if lp is not None and best[j] != -math.inf:
                s = best[j] + lp
                if s > best[i]:
                    best[i] = s
                    back[i] = j
    if best[n] == -math.inf:
        raise ValueError(f"unsegmentable word {word!r} under this vocab")
    pieces: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        pieces.append(word[j:i])
        i = j
    pieces.reverse()
    return pieces


def _logp_from_totals(totals: dict[str, int]) -> dict[str, float]:
    """MLE log-probs from exact integer fixed-point totals — computed
    once, driver-side, so float order-dependence cannot enter."""
    z = math.log(sum(totals.values()))
    return {p: math.log(c) - z for p, c in totals.items() if c > 0}


# ------------------------------------------------------------ seed vocab
def seed_pieces(
    wc: DataFrame, max_piece_len: int = 4, seed_size: int = 1000
) -> DataFrame:
    """(piece, total) seed vocabulary: every substring of length
    2..max_piece_len of every distinct word, weighted by occurrence
    position count x word count, topped at ``seed_size`` — PLUS every
    single character (always kept, so every word stays segmentable).
    Distributed: the substring explode is over the DISTINCT-word table
    (len(w) x max_piece_len rows per word), one groupBy(piece) shuffle,
    and the top-k is Spark's TakeOrdered (no global sort)."""
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.length("w") - 1),
            lambda j: F.transform(
                F.sequence(F.lit(1), F.lit(max_piece_len)),
                lambda l: F.substring(F.col("w"), j + 1, l),
            ),
        )
    )
    # substring(w, j+1, l) quietly truncates at the word end, so a
    # near-boundary (j, l) yields the same short piece several times —
    # that is exactly the positional occurrence count for the short
    # piece and is kept (the sequential reference counts the same way)
    exploded = wc.select("cnt", F.explode(subs).alias("piece"))
    totals = exploded.groupBy("piece").agg(
        F.sum(F.col("cnt")).alias("total")
    )
    chars = totals.where(F.length("piece") == 1)
    multi = (
        totals.where(F.length("piece") >= 2)
        .orderBy(F.col("total").desc(), F.col("piece"))
        .limit(seed_size)
    )
    return chars.unionByName(multi)


# -------------------------------------------------------------- training
def _estep_counts(
    wc: DataFrame, logp: dict[str, float], max_len: int
) -> dict[str, int]:
    """One distributed E+M step: expected piece counts (integer fixed
    point) summed exactly over the word-count table."""
    spark = wc.sparkSession
    bc = spark.sparkContext.broadcast(logp)

    @F.pandas_udf("array<struct<p:string,c:long>>")
    def _expected(w: pd.Series, cnt: pd.Series) -> pd.Series:
        lp = bc.value
        out = []
        for word, c in zip(w, cnt):
            ec, _ = forward_backward_counts(word, lp, max_len)
            out.append(
                [
                    {"p": p, "c": int(round(e * int(c) * FP))}
                    for p, e in ec.items()
                ]
            )
        return pd.Series(out)

    rows = (
        wc.select(F.explode(_expected("w", "cnt")).alias("x"))
        .groupBy(F.col("x.p").alias("p"))
        .agg(F.sum("x.c").alias("c"))
        .collect()
    )
    bc.destroy()  # one broadcast per E-step; don't pin them all session
    return {r["p"]: int(r["c"]) for r in rows if r["c"] > 0}


def _with_char_floor(totals: dict[str, int], chars: set[str]) -> dict[str, int]:
    """Re-add every corpus character at a floor of 1 fixed-point unit
    (1/FP expected occurrences). An E-step can quantize a rare single
    char's expected count to 0 when longer pieces absorb nearly all of
    its posterior mass — dropping it would make some word unsegmentable
    (SentencePiece likewise never drops required characters)."""
    out = dict(totals)
    for ch in chars:
        if out.get(ch, 0) <= 0:
            out[ch] = 1
    return out


def _prune(totals: dict[str, int], keep: int) -> dict[str, int]:
    """Keep all single characters plus the top multi-char pieces by
    (expected count desc, piece asc) until ``keep`` pieces total."""
    chars = {p: c for p, c in totals.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in totals.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )
    room = max(0, keep - len(chars))
    kept = dict(multi[:room])
    kept.update(chars)
    return kept


def train_unigram(
    docs: DataFrame,
    vocab_size: int = 120,
    *,
    max_piece_len: int = 4,
    seed_size: int = 1000,
    em_iters: int = 2,
    shrink: float = 0.75,
    text_col: str = "text",
) -> list[tuple[str, float]]:
    """Learn the unigram piece table: [(piece, logp), ...] sorted by
    piece. Seed large -> alternate (EM x em_iters, prune by shrink)
    until <= vocab_size -> one final EM refit. Deterministic pure
    function of the corpus word counts (integer-fixed-point E-steps,
    driver-side log-prob refits)."""
    wc = word_counts(docs, text_col).localCheckpoint(eager=True)
    seed = {
        r["piece"]: int(r["total"]) * FP
        for r in seed_pieces(wc, max_piece_len, seed_size).collect()
    }
    chars = {p for p in seed if len(p) == 1}
    totals = seed
    logp = _logp_from_totals(totals)
    while True:
        for _ in range(em_iters):
            totals = _with_char_floor(
                _estep_counts(wc, logp, max_piece_len), chars
            )
            logp = _logp_from_totals(totals)
        if len(totals) <= vocab_size:
            break
        keep = max(vocab_size, int(len(totals) * shrink))
        pruned = _prune(totals, keep)
        if len(pruned) >= len(totals):
            # chars alone exceed vocab_size: can't shrink further
            totals = pruned
            break
        totals = pruned
        logp = _logp_from_totals(totals)
    totals = _with_char_floor(_estep_counts(wc, logp, max_piece_len), chars)
    logp = _logp_from_totals(totals)
    return sorted(logp.items())


# -------------------------------------------------------------- encoding
def viterbi_score_fp(
    word: str, scores_fp: dict[str, int], max_len: int
) -> int | None:
    """Best-segmentation total score for one word under an INTEGER
    fixed-point piece-score table (units of 1e-6 log-prob). Max-sum DP
    over exact integers: max is commutative/associative and the sums
    never round, so the result is a pure function of (word, table) on
    any engine — this is the cross-engine contract the driver gate
    hash-matches against a DuckDB recursive-CTE twin. Returns None for
    a word not segmentable from the table (both engines drop it)."""
    n = len(word)
    neg = None
    best: list[int | None] = [neg] * (n + 1)
    best[0] = 0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            s = scores_fp.get(word[j:i])
            bj = best[j]
            if s is not None and bj is not None:
                cand = bj + s
                bi = best[i]
                if bi is None or cand > bi:
                    best[i] = cand
    return best[n]


def word_viterbi_scores(
    docs: DataFrame, scores_fp: dict[str, int], text_col: str = "text"
) -> DataFrame:
    """(w, cnt, viterbi_fp) for every segmentable DISTINCT word of the
    corpus: occurrence count plus the word's best segmentation score
    under the fixed integer piece table. The corpus-sized work is the
    one word-count shuffle; the DP UDF then runs over the DISTINCT-word
    table only (the same bounded regime as training), so this is also
    the scale shape for scoring a 100 TB corpus."""
    wc = word_counts(docs, text_col)
    max_len = max((len(p) for p in scores_fp), default=1)

    @F.pandas_udf("long")
    def _score(w: pd.Series) -> pd.Series:
        return pd.Series(
            [viterbi_score_fp(word, scores_fp, max_len) for word in w],
            dtype="Int64",
        )

    return (
        wc.select(F.col("w"), F.col("cnt"), _score("w").alias("viterbi_fp"))
        .where(F.col("viterbi_fp").isNotNull())
    )


def unigram_code_table(
    df: DataFrame, pieces: list[tuple[str, float]], text_col: str = "text"
) -> DataFrame:
    """(w, pcs array<string>): every DISTINCT corpus word Viterbi-
    segmented exactly once, distributedly — the bounded table the
    corpus-scale encode broadcast-joins back (same shape and same OOV
    single-char fallback as the per-batch path)."""
    from prefix_filter_spark.sources.tokenizer import words_col

    dw = df.select(F.explode(words_col(text_col)).alias("w")).distinct()
    max_len = max((len(p) for p, _ in pieces), default=1)
    bc = df.sparkSession.sparkContext.broadcast(dict(pieces))

    @F.pandas_udf("array<string>")
    def _enc(w: pd.Series) -> pd.Series:
        lp = bc.value
        out = []
        for word in w:
            try:
                out.append(viterbi_encode_word(word, lp, max_len))
            except ValueError:
                out.append(list(word))
        return pd.Series(out)

    return dw.select("w", _enc("w").alias("pcs"))


def apply_piece_table(
    df: DataFrame,
    codes: dict,
    text_col: str = "text",
    out_col: str = "pieces",
) -> DataFrame:
    """Map-only lookup pass from a prepared ``{word: [pieces]}`` table
    (``unigram_code_table`` collected): one broadcast, zero shuffle,
    ~1us/word. This is where the code-table strategy actually WINS at
    gate scale (bench rows ``ug_encode_batch`` vs ``ug_encode_bcast``,
    measured 2.1x): Viterbi's DP cost (O(len x max_piece_len) dict
    probes per word) is an order of magnitude above a dict lookup,
    while its output is a handful of pieces — so replacing per-batch
    re-derivation with lookups pays. (The WordPiece MaxMatch twin
    ``wordpiece.apply_code_table`` is output-identical too, but its
    emit cost dominates its DP at sandbox scale, so its win only
    appears at larger batch counts — measured numbers in
    BENCH/BASELINE.md.) Raises KeyError for a word absent from the
    table: build it over the same corpus + normalization."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(codes)

    @F.pandas_udf("array<array<string>>")
    def _lookup(text: pd.Series) -> pd.Series:
        m = bc.value
        return pd.Series(
            [[m[w] for w in (t or "").lower().split(" ") if w] for t in text]
        )

    return df.withColumn(out_col, _lookup(F.col(text_col)))


def encode_unigram_bcast(
    df: DataFrame,
    pieces: list[tuple[str, float]],
    text_col: str = "text",
    out_col: str = "pieces",
) -> DataFrame:
    """Corpus-scale encode: Viterbi the distinct-word table once
    (``unigram_code_table``), collect + broadcast it, lookup-apply
    (``apply_piece_table``). Output-identical to ``encode_unigram``
    (pytest-pinned); the DP runs once per distinct word in the corpus
    instead of once per distinct word per Arrow batch."""
    codes = {
        r["w"]: list(r["pcs"])
        for r in unigram_code_table(df, pieces, text_col).collect()
    }
    return apply_piece_table(df, codes, text_col, out_col)


def encode_unigram_join(
    df: DataFrame,
    pieces: list[tuple[str, float]],
    text_col: str = "text",
    out_col: str = "pieces",
) -> DataFrame:
    """``encode_unigram``'s corpus-scale twin (output-identical,
    pytest-pinned): encode the distinct-word table once
    (``unigram_code_table``), broadcast-join onto the posexploded word
    stream, reassemble per doc ordered by word position. The Viterbi
    DP runs once per distinct word in the WHOLE corpus instead of once
    per distinct word per Arrow batch — the win on duplicate-heavy
    corpora; the price is the distinct shuffle + one corpus regroup.
    Keeps every input column (join back on doc_id) like the
    withColumn of the batch path."""
    from prefix_filter_spark.sources.tokenizer import words_col

    table = unigram_code_table(df, pieces, text_col)
    exploded = df.select(
        "doc_id", F.posexplode(words_col(text_col)).alias("pos", "w")
    )
    packed = (
        exploded.join(F.broadcast(table), "w")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "pcs"))).alias("srt"))
        .select("doc_id", F.col("srt").getField("pcs").alias(out_col))
    )
    return df.join(packed, "doc_id", "left").withColumn(
        out_col,
        F.coalesce(out_col, F.array().cast("array<array<string>>")),
    )


def encode_unigram(
    df: DataFrame,
    pieces: list[tuple[str, float]],
    text_col: str = "text",
    out_col: str = "pieces",
) -> DataFrame:
    """Viterbi-segment every word of ``text_col`` into trained pieces
    (array<array<string>>, one inner array per word). Corpus-scale
    shape, same strategy as BPE's vectorized encode (operators/bpe.py):
    each Arrow batch Viterbi-encodes only its UNIQUE words once and
    fans the segmentations back out per row, so per-batch DP work is
    O(distinct words x len x max_piece_len), not O(rows). Words with a
    character unseen at training time fall back to raw single-char
    pieces (lossless, possibly outside the vocab) — the same OOV
    contract as BPE's encode; they never fail the job."""
    spark = df.sparkSession
    max_len = max((len(p) for p, _ in pieces), default=1)
    bc = spark.sparkContext.broadcast(dict(pieces))

    @F.pandas_udf("array<array<string>>")
    def _enc(texts: pd.Series) -> pd.Series:
        lp = bc.value
        doc_words = [
            [w for w in (t or "").lower().split(" ") if w] for t in texts
        ]
        enc: dict[str, list[str]] = {}
        for ws in doc_words:
            for w in ws:
                if w not in enc:  # DP once per UNIQUE word per batch
                    try:
                        enc[w] = viterbi_encode_word(w, lp, max_len)
                    except ValueError:
                        # OOV character (unseen at training time): fall
                        # back to raw single chars, lossless — the same
                        # contract as BPE's encode, which emits unknown
                        # chars as bare pieces instead of failing the job
                        enc[w] = list(w)
        return pd.Series([[enc[w] for w in ws] for ws in doc_words])

    return df.withColumn(out_col, _enc(F.col(text_col)))
