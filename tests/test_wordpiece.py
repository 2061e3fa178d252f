"""Distributed WordPiece training/encoding (operators/wordpiece.py) vs
a sequential pure-Python reference — the naive-vs-optimized cross-check
strategy the reference repo uses for its kernels (SURVEY.md §5).

The reference trainer mirrors the HuggingFace-tokenizers WordPiece
criterion (score = pair_count / (count(a) * count(b)), same double
arithmetic, same (score, total, a, b) tie-break) so merge tables must
match EXACTLY, and the encoder is checked against BERT MaxMatch
semantics directly (longest vocab prefix at each position, whole-word
[UNK] on any miss).
"""

from collections import Counter

import pytest

from prefix_filter_spark.operators.wordpiece import (
    CONT,
    UNK,
    encode_wordpiece,
    maxmatch_word,
    merged_token,
    train_wordpiece,
    wordpiece_vocab,
)


def _ref_wordpiece(word_cnt: dict[str, int], num_merges: int):
    """Sequential reference: likelihood-gain argmax with the exact
    tie-break and float arithmetic of the Spark trainer."""
    vocab = {
        tuple([w[0]] + [CONT + c for c in w[1:]]): c
        for w, c in word_cnt.items()
    }
    merges = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        syms_cnt: Counter = Counter()
        for syms, c in vocab.items():
            for s in syms:
                syms_cnt[s] += c
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        best = None
        for (a, b), total in pairs.items():
            if total < 2:
                continue
            score = total / (float(syms_cnt[a]) * float(syms_cnt[b]))
            key = (score, total, a, b)
            if best is None or key > best[0]:
                best = (key, a, b, total, score)
        if best is None:
            break
        _, a, b, total, score = best
        merges.append((a, b, total, score))
        m = merged_token(a, b)
        new_vocab: dict = {}
        for syms, c in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(m)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            t = tuple(res)
            new_vocab[t] = new_vocab.get(t, 0) + c
        vocab = new_vocab
    return merges


def _corpus(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


TEXTS = [
    "the lower lowest low slower slow slowest",
    "new newer newest wide wider widest",
    "the the the low lower new newer",
    "slow slowly widely newly lowly",
]


def _word_cnt(texts):
    c: Counter = Counter()
    for t in texts:
        for w in t.lower().split(" "):
            if w:
                c[w] += 1
    return dict(c)


def test_train_matches_sequential_reference(spark):
    docs = _corpus(spark, TEXTS)
    got = train_wordpiece(docs, num_merges=15)
    want = _ref_wordpiece(_word_cnt(TEXTS), 15)
    assert [(a, b, t) for a, b, t, _ in got] == [
        (a, b, t) for a, b, t, _ in want
    ]
    for (_, _, _, gs), (_, _, _, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=0.0)  # same double arithmetic


def test_train_partition_invariant(spark):
    docs = _corpus(spark, TEXTS)
    one = train_wordpiece(docs.repartition(1), num_merges=8)
    many = train_wordpiece(docs.repartition(7), num_merges=8)
    assert one == many


def test_continuation_marks_follow_position(spark):
    """Position-0 tokens never carry ##; non-initial always do — for
    every merge produced on a real corpus."""
    docs = _corpus(spark, TEXTS)
    merges = train_wordpiece(docs, num_merges=12)
    assert merges, "corpus must produce merges"
    for a, b, _, _ in merges:
        assert b.startswith(CONT), f"right operand {b!r} must be non-initial"
        m = merged_token(a, b)
        assert m.startswith(CONT) == a.startswith(CONT)


def test_maxmatch_is_greedy_longest():
    vocab = {"un", "##aff", "##able", "##ffable", "##a", "a", "b", "##b"}
    # at pos 2 the longest match is ##ffable (not ##a or ##aff)
    assert maxmatch_word("unffable", vocab, 7) == ["un", "##ffable"]
    # un + ##aff + ##able: longest-first at each step
    assert maxmatch_word("unaffable", vocab, 7) == ["un", "##aff", "##able"]
    # any unmatchable position -> whole word is UNK (BERT semantics)
    assert maxmatch_word("unzip", vocab, 7) == [UNK]
    assert maxmatch_word("ab", vocab, 7) == ["a", "##b"]


def test_encode_roundtrip_and_parity(spark):
    """Spark encode == per-word reference MaxMatch over the same vocab,
    and detokenization (strip ##, join) reconstructs every non-UNK
    word."""
    docs = _corpus(spark, TEXTS)
    merges = train_wordpiece(docs, num_merges=12)
    vocab = wordpiece_vocab(docs, merges)
    vset = set(vocab)
    cover = max(len(t) - (2 if t.startswith(CONT) else 0) for t in vocab)

    out = {
        r["doc_id"]: r["wp_tokens"]
        for r in encode_wordpiece(docs, vocab).collect()
    }
    for i, t in enumerate(TEXTS):
        want = []
        for w in t.lower().split(" "):
            if w:
                want.extend(maxmatch_word(w, vset, cover))
        assert out[i] == want
    # vocabulary covers its own training corpus: no UNK anywhere
    flat = [tok for toks in out.values() for tok in toks]
    assert UNK not in flat
    # round-trip: regrouping tokens by ## marks reconstructs the words
    words = []
    for tok in out[0]:
        if tok.startswith(CONT):
            words[-1] += tok[len(CONT):]
        else:
            words.append(tok)
    assert words == [w for w in TEXTS[0].lower().split(" ") if w]


def test_unk_on_unseen_alphabet(spark):
    docs = _corpus(spark, TEXTS)
    merges = train_wordpiece(docs, num_merges=5)
    vocab = wordpiece_vocab(docs, merges)
    probe = _corpus(spark, ["low слово slow"])  # Cyrillic word unseen
    toks = encode_wordpiece(probe, vocab).collect()[0]["wp_tokens"]
    assert UNK in toks
    assert toks[0] != UNK and toks[-1] != UNK  # known words still encode


def test_join_encode_equals_batch(spark):
    """VERDICT r4 item 3 gate: the corpus-scale join path (encode the
    distinct-word table once, broadcast-join back, reassemble by word
    position) is output-identical to the per-batch memoized encoder —
    including docs with empty text."""
    texts = TEXTS * 5 + [""]
    docs = _corpus(spark, texts).repartition(5)
    merges = train_wordpiece(_corpus(spark, TEXTS), num_merges=12)
    vocab = wordpiece_vocab(_corpus(spark, TEXTS), merges)
    batch = {
        r["doc_id"]: (list(r["wp_tokens"]), r["n_wp"])
        for r in encode_wordpiece(docs, vocab).collect()
    }
    join = {
        r["doc_id"]: (list(r["wp_tokens"]), r["n_wp"])
        for r in encode_wordpiece(docs, vocab, strategy="join").collect()
    }
    assert batch == join and len(batch) == len(texts)


def test_encode_strategy_rejects_unknown(spark):
    docs = _corpus(spark, TEXTS)
    merges = train_wordpiece(docs, num_merges=3)
    vocab = wordpiece_vocab(docs, merges)
    import pytest as _pt

    with _pt.raises(ValueError, match="strategy"):
        encode_wordpiece(docs, vocab, strategy="nope")


def test_broadcast_encode_equals_batch(spark):
    """strategy='broadcast' (distinct-word table -> one dict broadcast
    -> map-only lookup) is output-identical to the per-batch path."""
    texts = TEXTS * 5 + [""]
    docs = _corpus(spark, texts).repartition(5)
    merges = train_wordpiece(_corpus(spark, TEXTS), num_merges=12)
    vocab = wordpiece_vocab(_corpus(spark, TEXTS), merges)
    batch = {
        r["doc_id"]: (list(r["wp_tokens"]), r["n_wp"])
        for r in encode_wordpiece(docs, vocab).collect()
    }
    bcast = {
        r["doc_id"]: (list(r["wp_tokens"]), r["n_wp"])
        for r in encode_wordpiece(docs, vocab, strategy="broadcast").collect()
    }
    assert batch == bcast and len(batch) == len(texts)


def test_batch_path_repeats_dp_work_join_path_does_not(spark):
    """Scale-free evidence for the corpus-scale strategies: on a
    duplicate-heavy corpus the per-batch memoized encoder re-runs its
    DP once per distinct word PER BATCH, while the code-table paths
    run it once per distinct word in the corpus. Measured directly:
    sum over Arrow batches of per-batch distinct-word counts vs the
    global distinct count (>= 5x here; grows with batch count at real
    scale — the asymmetry the broadcast strategy exists for)."""
    from pyspark.sql import functions as F

    texts = TEXTS * 40
    docs = _corpus(spark, texts).repartition(8)

    def batch_distinct(batches):
        import pandas as pd

        for pdf in batches:
            words = {
                w
                for t in pdf["text"]
                for w in (t or "").lower().split(" ")
                if w
            }
            yield pd.DataFrame({"n": [len(words)]})

    per_batch = (
        docs.mapInPandas(batch_distinct, schema="n long")
        .agg(F.sum("n"))
        .first()[0]
    )
    global_distinct = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .where(F.col("w") != "")
        .distinct()
        .count()
    )
    assert per_batch >= 5 * global_distinct
