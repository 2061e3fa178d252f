"""Distributed WordPiece tokenizer training + MaxMatch encoding
(Schuster & Nakajima 2012, "Japanese and Korean voice search"; the
BERT tokenizer) — completes the engine's subword-tokenizer family:
BPE (operators/bpe.py, frequency argmax), unigram-LM
(operators/unigram.py, EM prune + Viterbi), WordPiece (this module,
likelihood-gain argmax + greedy longest-match encode).

Training is BPE's iterative merge protocol with ONE changed line: the
selected pair maximizes the likelihood GAIN score

    score(a, b) = count(ab) / (count(a) * count(b))

instead of the raw pair count (the HuggingFace-tokenizers WordPiece
trainer criterion — merging the pair that most increases corpus
likelihood under a unigram LM over the current symbols). Continuation
symbols carry the standard ``##`` prefix: a word splits into
``[w0, ##w1, ..., ##wk]``, and merge(a, b) = a + b-without-its-##, so
position-0 tokens never carry ``##`` and every non-initial token does.

Scale shape (identical to operators/bpe.py, the part that matters at
100 TB): ONE corpus-sized pass (explode words -> groupBy count), then
every training round runs on the vocabulary-sized word-count table —
per round: one pair-count shuffle + one symbol-count shuffle (both
vocab-bounded), one single-row argmax collect, one Arrow-batched
rewrite of touched rows, per-round localCheckpoint to cut iterative
lineage. Corpus size never appears in the loop.

Determinism: the score is computed in pure double arithmetic
(count(a)/count(b) are cast to double BEFORE multiplying, so the
product cannot overflow LongType at 10^12-token scale under ANSI),
and the argmax is ``max(struct(score, total, a, b))`` — ties broken by
raw pair count then UTF8-binary symbol order, a pure function of the
word-count table, independent of partitioning. The sequential
pytest reference (tests/test_wordpiece.py) mirrors the same float
division and tuple tie-break.

Encoding is WordPiece's greedy longest-match-first (MaxMatch): at
each position take the longest vocab token matching (with ``##``
applied for non-initial positions); a word with an unmatchable
position encodes to ``[UNK]`` wholesale (BERT semantics). The pandas
UDF memoizes per-batch DISTINCT words, so cost per batch is bounded
by distinct-word count, not row count; the corpus-scale path is the
same one documented for BPE — encode the distinct-word table once and
broadcast-join back (word Zipf means distinct words are ~1e6-1e8
while the corpus is 1e12).

Reference scope note: the reference repo (TomerEven/Prefix-Filter) has
no tokenizer; this extends the training-data family mandated by the
brief beside operators/bpe.py and operators/unigram.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prefix_filter_spark.operators.bpe import word_counts

CONT = "##"
UNK = "[UNK]"


def _initial_vocab(wc: DataFrame) -> DataFrame:
    """(cnt, syms): word -> [first-char, ##c1, ..., ##ck]."""
    chars = F.filter(F.split(F.col("w"), ""), lambda c: c != F.lit(""))
    syms = F.transform(
        chars,
        lambda c, i: F.when(i == 0, c).otherwise(F.concat(F.lit(CONT), c)),
    )
    return wc.select("cnt", syms.alias("syms"))


def _pair_scores(vocab: DataFrame) -> DataFrame:
    """(a, b, total, score): adjacent-pair counts joined with symbol
    counts, score = total / (cnt_a * cnt_b) in double arithmetic.

    Both aggregates are over the vocab table (vocabulary-sized); the
    two joins against the symbol-count side are small-side joins AQE
    broadcasts at any realistic vocab size."""
    pairs = F.transform(
        F.sequence(F.lit(0), F.size("syms") - 2),
        lambda i: F.struct(
            F.element_at("syms", i + 1).alias("a"),
            F.element_at("syms", i + 2).alias("b"),
        ),
    )
    pair_counts = (
        vocab.where(F.size("syms") >= 2)
        .select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("total"))
    )
    sym_counts = (
        vocab.select("cnt", F.explode("syms").alias("s"))
        .groupBy("s")
        .agg(F.sum("cnt").alias("s_cnt"))
    )
    return (
        pair_counts.join(sym_counts.withColumnRenamed("s", "a"), "a")
        .withColumnRenamed("s_cnt", "a_cnt")
        .join(sym_counts.withColumnRenamed("s", "b"), "b")
        .withColumnRenamed("s_cnt", "b_cnt")
        .select(
            "a",
            "b",
            "total",
            (
                F.col("total")
                / (
                    F.col("a_cnt").cast("double")
                    * F.col("b_cnt").cast("double")
                )
            ).alias("score"),
        )
    )


def merged_token(a: str, b: str) -> str:
    """merge(a, b): the ## continuation mark belongs to the POSITION,
    not the pair — b (always non-initial) drops its mark on fusing."""
    return a + (b[len(CONT):] if b.startswith(CONT) else b)


def _merge_udf(a: str, b: str):
    m = merged_token(a, b)

    @F.pandas_udf("array<string>")
    def _merge(syms: pd.Series) -> pd.Series:
        def one(xs):
            out, i, n = [], 0, len(xs)
            while i < n:
                if i + 1 < n and xs[i] == a and xs[i + 1] == b:
                    out.append(m)
                    i += 2
                else:
                    out.append(xs[i])
                    i += 1
            return out

        return syms.map(one)

    return _merge


def train_wordpiece(
    docs: DataFrame, num_merges: int = 50, text_col: str = "text"
) -> list[tuple[str, str, int, float]]:
    """Learn the merge table: [(left, right, pair_count, score), ...]
    in merge order. Stops early when no pair occurs twice."""
    vocab = _initial_vocab(word_counts(docs, text_col)).localCheckpoint(
        eager=True
    )
    # union-per-round partition-count ceiling, same reasoning as
    # bpe.train_bpe (doubling task counts otherwise)
    n_parts = int(
        docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    merges: list[tuple[str, str, int, float]] = []
    for _ in range(num_merges):
        top = (
            _pair_scores(vocab)
            .where(F.col("total") >= 2)
            .agg(F.max(F.struct("score", "total", "a", "b")).alias("m"))
            .collect()[0]["m"]
        )
        if top is None:
            break
        a, b = top["a"], top["b"]
        merges.append((a, b, int(top["total"]), float(top["score"])))
        touched = F.array_contains("syms", a) & F.array_contains("syms", b)
        vocab = (
            vocab.where(touched)
            .select("cnt", _merge_udf(a, b)(F.col("syms")).alias("syms"))
            .unionByName(vocab.where(~touched))
            .coalesce(n_parts)
            .localCheckpoint(eager=True)
        )
    return merges


def wordpiece_vocab(
    docs: DataFrame, merges: list[tuple], text_col: str = "text"
) -> list[str]:
    """Final token vocabulary: the training corpus's initial alphabet
    (position-0 chars and ##-marked continuation chars, one distinct
    pass over the word-count table) + one token per merge, in a
    deterministic order (alphabet sorted, then merge order)."""
    alpha_rows = (
        _initial_vocab(word_counts(docs, text_col))
        .select(F.explode("syms").alias("s"))
        .distinct()
        .collect()
    )
    alphabet = sorted(r["s"] for r in alpha_rows)
    seen = set(alphabet)
    out = list(alphabet)
    for mrow in merges:
        t = merged_token(mrow[0], mrow[1])
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out


def maxmatch_word(word: str, vocab: set[str], max_cover: int) -> list[str]:
    """Greedy longest-match-first encode of one word (BERT
    WordpieceTokenizer semantics: any unmatchable position -> the
    whole word is [UNK]). ``max_cover`` bounds candidate length = the
    longest raw-character span any vocab token covers."""
    out: list[str] = []
    i, n = 0, len(word)
    while i < n:
        j_hi = min(n, i + max_cover)
        tok = None
        for j in range(j_hi, i, -1):
            cand = word[i:j] if i == 0 else CONT + word[i:j]
            if cand in vocab:
                tok = cand
                i = j
                break
        if tok is None:
            return [UNK]
        out.append(tok)
    return out


def _max_cover(vocab: list[str]) -> int:
    cover = 1
    for t in vocab:
        c = len(t) - (len(CONT) if t.startswith(CONT) else 0)
        if c > cover:
            cover = c
    return cover


def encode_udf(vocab: list[str], spark):
    """text -> array<string> WordPiece tokens, map-only. The vocab
    rides ONE broadcast; the pandas UDF memoizes distinct words per
    batch, so per-batch cost is distinct-word-bounded (Zipf: a few
    percent of row count). For a full 10^12-sequence corpus, encode
    the distinct-word table once and broadcast-join back instead —
    same shape documented at bpe.encode_udf."""
    bc = spark.sparkContext.broadcast((set(vocab), _max_cover(vocab)))

    @F.pandas_udf("array<string>")
    def _encode(text: pd.Series) -> pd.Series:
        vset, cover = bc.value
        memo: dict[str, list[str]] = {}

        def enc(t):
            out: list[str] = []
            # same word split as training (sources.tokenizer.words_col:
            # lower, single-space split, empties dropped)
            for w in t.lower().split(" "):
                if not w:
                    continue
                got = memo.get(w)
                if got is None:
                    got = maxmatch_word(w, vset, cover)
                    memo[w] = got
                out.extend(got)
            return out

        return text.map(enc)

    return _encode


def wordpiece_code_table(
    docs: DataFrame, vocab: list[str], text_col: str = "text"
) -> DataFrame:
    """(w, toks array<string>): every DISTINCT corpus word MaxMatch-
    encoded exactly once, distributedly. Bounded output by word Zipf
    (~1e6-1e8 distinct words against a 1e12-word corpus), so the table
    broadcasts — the corpus-scale encode joins it back instead of
    re-running the DP per batch."""
    from prefix_filter_spark.sources.tokenizer import words_col

    dw = docs.select(F.explode(words_col(text_col)).alias("w")).distinct()
    bc = docs.sparkSession.sparkContext.broadcast((set(vocab), _max_cover(vocab)))

    @F.pandas_udf("array<string>")
    def _enc(w: pd.Series) -> pd.Series:
        vset, cover = bc.value
        return pd.Series([maxmatch_word(x, vset, cover) for x in w])

    return dw.select("w", _enc("w").alias("toks"))


def apply_code_table(
    docs: DataFrame, codes: dict, text_col: str = "text"
) -> DataFrame:
    """Map-only lookup pass: (doc_id, wp_tokens, n_wp) from a prepared
    ``{word: [tokens]}`` code table (``wordpiece_code_table`` collected,
    or any externally trained word->pieces map). One broadcast, zero
    shuffle, ~1-2us/word — the amortized per-encode cost of the
    broadcast strategy once the table exists (a production pipeline
    builds the table once per vocab + corpus snapshot and encodes many
    times; the bench rows time exactly this asymmetry). Raises KeyError
    for a word absent from the table — the table must come from the
    same corpus/word-normalization it is applied to."""
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(codes)

    @F.pandas_udf("array<string>")
    def _lookup(text: pd.Series) -> pd.Series:
        m = bc.value
        return pd.Series(
            [
                [t for w in (x or "").lower().split(" ") if w for t in m[w]]
                for x in text
            ]
        )

    return docs.select(
        "doc_id", _lookup(F.col(text_col)).alias("wp_tokens")
    ).withColumn("n_wp", F.size("wp_tokens"))


def encode_wordpiece(
    docs: DataFrame,
    vocab: list[str],
    text_col: str = "text",
    strategy: str = "batch",
) -> DataFrame:
    """(doc_id, wp_tokens array<string>, n_wp int).

    ``strategy="batch"`` (default): map-only pandas UDF, per-batch
    distinct-word memoization — zero shuffle, the small/medium-corpus
    path, but the MaxMatch DP re-runs for the same word in every Arrow
    batch that sees it.

    ``strategy="broadcast"`` (the corpus-scale default for vocabularies
    whose code table fits executor memory): encode the DISTINCT-word
    table once (``wordpiece_code_table`` — one bounded distributed
    job), collect it, ship it as ONE broadcast dict, and apply a
    map-only lookup pass over the corpus. The MaxMatch DP runs once
    per distinct word in the WHOLE corpus instead of once per distinct
    word per Arrow batch, and the corpus never shuffles — on a
    duplicate-heavy corpus (crawl dumps, boilerplate, the x8-mirror
    regime) this wins by the cross-batch duplication factor
    (bench rows ``wp_encode_batch`` vs ``wp_encode_bcast``).

    ``strategy="join"`` (the over-broadcast fallback): same distinct
    encode, but codes stay distributed — broadcast-join onto the
    posexploded word stream, reassemble per doc (array_sort by word
    position, flatten). Pays one corpus regroup shuffle; the right
    shape only when the code table itself is too large to broadcast
    (10^9+ distinct words). All three strategies are output-identical
    (pytest-pinned).
    """
    spark = docs.sparkSession
    if strategy == "batch":
        enc = encode_udf(vocab, spark)
        return docs.select(
            "doc_id",
            enc(F.col(text_col)).alias("wp_tokens"),
        ).withColumn("n_wp", F.size("wp_tokens"))
    if strategy == "broadcast":
        table = wordpiece_code_table(docs, vocab, text_col)
        codes = {r["w"]: list(r["toks"]) for r in table.collect()}
        return apply_code_table(docs, codes, text_col)
    if strategy != "join":
        raise ValueError(
            f"strategy must be 'batch', 'broadcast' or 'join', got {strategy!r}"
        )
    from prefix_filter_spark.sources.tokenizer import words_col

    table = wordpiece_code_table(docs, vocab, text_col)
    exploded = docs.select(
        "doc_id", F.posexplode(words_col(text_col)).alias("pos", "w")
    )
    packed = (
        exploded.join(F.broadcast(table), "w")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "toks"))).alias("srt"))
        .select(
            "doc_id", F.flatten(F.col("srt").getField("toks")).alias("wp_tokens")
        )
    )
    # empty-text docs vanish in posexplode; restore them with []
    return (
        docs.select("doc_id")
        .join(packed, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(
                "wp_tokens", F.array().cast("array<string>")
            ).alias("wp_tokens"),
        )
        .withColumn("n_wp", F.size("wp_tokens"))
    )
