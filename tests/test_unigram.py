"""Unigram-LM tokenizer gates (operators/unigram.py, Kudo 2018):

- forward-backward expected counts == brute-force segmentation
  enumeration (independent math oracle, no shared code path);
- distributed training == a sequential pure-Python reference driver
  over the same word counts (exact equality — integer fixed point
  makes the whole run order-independent);
- repartition invariance of the trained table;
- Viterbi encode: lossless roundtrip, vocab-closed, deterministic;
- EM likelihood monotonicity on pure EM iterations (no pruning).
"""

from __future__ import annotations

import itertools
import math

import pytest

from prefix_filter_spark.operators.unigram import (
    FP,
    _estep_counts,
    _logp_from_totals,
    _prune,
    _with_char_floor,
    encode_unigram,
    forward_backward_counts,
    seed_pieces,
    train_unigram,
    viterbi_encode_word,
)


def _enumerate_counts(word, logp, max_len):
    """Brute-force oracle: enumerate every segmentation, weight by its
    probability, average piece occurrence counts."""
    n = len(word)
    segs = []
    def rec(i, acc):
        if i == n:
            segs.append(list(acc))
            return
        for j in range(i + 1, min(n, i + max_len) + 1):
            if word[i:j] in logp:
                acc.append(word[i:j])
                rec(j, acc)
                acc.pop()
    rec(0, [])
    if not segs:
        return {}, -math.inf
    ws = [math.exp(sum(logp[p] for p in s)) for s in segs]
    z = sum(ws)
    out = {}
    for s, w in zip(segs, ws):
        for p in s:
            out[p] = out.get(p, 0.0) + w / z
    return out, math.log(z)


CORPUS = [
    "low low low lower lowest",
    "new newer newest wide wider widest",
    "low wide new lower",
]


def _word_counts_py(lines):
    wc = {}
    for line in lines:
        for w in line.lower().split(" "):
            if w:
                wc[w] = wc.get(w, 0) + 1
    return wc


def _seed_py(wc, max_len, seed_size):
    totals = {}
    for w, c in wc.items():
        for j in range(len(w)):
            for l in range(1, max_len + 1):
                p = w[j : j + l]
                if p:
                    totals[p] = totals.get(p, 0) + c
    chars = {p: c for p, c in totals.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in totals.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[:seed_size]
    out = dict(multi)
    out.update(chars)
    return out


def _train_py(wc, vocab_size, max_len, seed_size, em_iters, shrink):
    """Sequential reference: same driver schedule as train_unigram but
    every E-step is a plain Python loop over the word-count dict."""
    totals = {p: c * FP for p, c in _seed_py(wc, max_len, seed_size).items()}
    chars = {p for p in totals if len(p) == 1}
    logp = _logp_from_totals(totals)

    def estep(lp):
        acc = {}
        for w, c in wc.items():
            ec, _ = forward_backward_counts(w, lp, max_len)
            for p, e in ec.items():
                q = int(round(e * c * FP))
                if q:
                    acc[p] = acc.get(p, 0) + q
        return _with_char_floor(
            {p: q for p, q in acc.items() if q > 0}, chars
        )

    while True:
        for _ in range(em_iters):
            totals = estep(logp)
            logp = _logp_from_totals(totals)
        if len(totals) <= vocab_size:
            break
        pruned = _prune(totals, max(vocab_size, int(len(totals) * shrink)))
        if len(pruned) >= len(totals):
            totals = pruned
            break
        totals = pruned
        logp = _logp_from_totals(totals)
    totals = estep(logp)
    return sorted(_logp_from_totals(totals).items())


@pytest.mark.parametrize(
    "word", ["lowest", "abcab", "aaaa", "newer", "zzz"]
)
def test_fb_counts_match_enumeration(word):
    pieces = set("abclonewstzir")
    pieces |= {"lo", "we", "est", "ne", "aa", "ab", "ca", "low", "er"}
    pieces = {p for p in pieces if p in
              {word[i:j] for i in range(len(word))
               for j in range(i + 1, min(len(word), i + 4) + 1)} or len(p) == 1}
    # deterministic weights (builtin hash() is salted per process and
    # would make a failure unreproducible)
    logp = {
        p: math.log((sum(map(ord, p)) % 7 + 1) / 50.0) for p in sorted(pieces)
    }
    got, gz = forward_backward_counts(word, logp, 4)
    want, wz = _enumerate_counts(word, logp, 4)
    assert got.keys() == want.keys()
    for p in want:
        assert got[p] == pytest.approx(want[p], abs=1e-9)
    assert gz == pytest.approx(wz, abs=1e-9)


def test_fb_unsegmentable():
    ec, z = forward_backward_counts("axe", {"a": -1.0, "e": -1.0}, 4)
    assert ec == {} and z == -math.inf


def _corpus_df(spark, parts=4):
    rows = [(i, line) for i, line in enumerate(CORPUS)]
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(
        parts
    )


def test_seed_pieces_matches_reference(spark):
    from prefix_filter_spark.operators.bpe import word_counts

    df = _corpus_df(spark)
    got = {
        r["piece"]: int(r["total"])
        for r in seed_pieces(word_counts(df), 4, 20).collect()
    }
    assert got == _seed_py(_word_counts_py(CORPUS), 4, 20)


def test_train_matches_sequential_reference(spark):
    df = _corpus_df(spark)
    got = train_unigram(
        df, vocab_size=15, max_piece_len=4, seed_size=30, em_iters=2
    )
    want = _train_py(
        _word_counts_py(CORPUS), 15, 4, 30, em_iters=2, shrink=0.75
    )
    assert [p for p, _ in got] == [p for p, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-12)


def test_partition_invariance(spark):
    a = train_unigram(_corpus_df(spark, 1), vocab_size=15, seed_size=30)
    b = train_unigram(_corpus_df(spark, 7), vocab_size=15, seed_size=30)
    assert a == b


def test_single_chars_survive_prune():
    totals = {"a": 1, "b": 2, "ab": 100, "ba": 90, "aab": 80}
    kept = _prune(totals, 3)
    assert "a" in kept and "b" in kept and list(kept) is not None
    assert set(kept) == {"a", "b", "ab"}


def test_em_likelihood_monotone(spark):
    """Classic EM guarantee: corpus log-likelihood never decreases
    across pure EM refits (no pruning between them)."""
    from prefix_filter_spark.operators.bpe import word_counts

    df = _corpus_df(spark)
    wcd = _word_counts_py(CORPUS)
    wc = word_counts(df).localCheckpoint(eager=True)
    totals = {
        r["piece"]: int(r["total"]) * FP
        for r in seed_pieces(wc, 4, 30).collect()
    }
    logp = _logp_from_totals(totals)

    def loglik(lp):
        return sum(
            c * forward_backward_counts(w, lp, 4)[1] for w, c in wcd.items()
        )

    prev = loglik(logp)
    for _ in range(3):
        totals = _estep_counts(wc, logp, 4)
        logp = _logp_from_totals(totals)
        cur = loglik(logp)
        # integer quantization of expected counts can wiggle the exact
        # argmax by ~1/FP; allow that epsilon, nothing more
        assert cur >= prev - 1e-6
        prev = cur


def test_encode_roundtrip_and_vocab_closed(spark):
    df = _corpus_df(spark)
    pieces = train_unigram(df, vocab_size=15, seed_size=30)
    vocab = {p for p, _ in pieces}
    enc = encode_unigram(df, pieces).select("text", "pieces").collect()
    assert len(enc) == len(CORPUS)
    for r in enc:
        words = [w for w in r["text"].lower().split(" ") if w]
        assert len(r["pieces"]) == len(words)
        for w, ps in zip(words, r["pieces"]):
            assert "".join(ps) == w
            assert all(p in vocab for p in ps)


def test_encode_oov_char_falls_back_to_raw_chars(spark):
    """A word with a character unseen at training time must not fail
    the job: it encodes as raw single chars (lossless), like BPE."""
    pieces = train_unigram(_corpus_df(spark), vocab_size=15, seed_size=30)
    oov = spark.createDataFrame(
        [(0, "low x9z lower")], "doc_id long, text string"
    )
    [r] = encode_unigram(oov, pieces).select("pieces").collect()
    segs = r["pieces"]
    assert ["".join(s) for s in segs] == ["low", "x9z", "lower"]
    assert segs[1] == ["x", "9", "z"]  # raw chars, not a crash


def test_viterbi_prefers_longest_on_tie():
    logp = {"a": math.log(0.25), "aa": math.log(0.0625)}
    # "aa" as one piece (0.0625) ties a+a (0.25*0.25): longest wins
    assert viterbi_encode_word("aa", logp, 2) == ["aa"]


# ------------------------------------------- integer fixed-point scorer
def _enumerate_best_fp(word, scores, max_len):
    """Brute-force oracle for viterbi_score_fp: max total score over
    ALL segmentations, exact integers."""
    n = len(word)
    best = [None]
    def rec(i, s):
        if i == n:
            if best[0] is None or s > best[0]:
                best[0] = s
            return
        for j in range(i + 1, min(n, i + max_len) + 1):
            if word[i:j] in scores:
                rec(j, s + scores[word[i:j]])
    rec(0, 0)
    return best[0]


@pytest.mark.parametrize("word", ["lowest", "aaaa", "newer", "zq", "abcab"])
def test_viterbi_score_fp_matches_enumeration(word):
    from prefix_filter_spark.operators.unigram import viterbi_score_fp

    scores = {c: -4_158_883 for c in "lowestanewrbc"}
    scores.update({"lo": -3_465_736, "we": -3_465_736, "est": -3_178_054,
                   "low": -3_178_054, "aa": -3_465_736, "ab": -3_465_736,
                   "new": -3_178_054, "er": -3_465_736})
    assert viterbi_score_fp(word, scores, 3) == _enumerate_best_fp(
        word, scores, 3
    )


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    word=st.text(alphabet="abc", min_size=1, max_size=9),
    extra=st.sets(
        st.text(alphabet="abc", min_size=2, max_size=3), max_size=6
    ),
    drop_char=st.sampled_from(["", "a", "b", "c"]),
)
def test_viterbi_score_fp_property(word, extra, drop_char):
    """Random small vocabularies over a 3-letter alphabet: the linear
    DP always equals brute-force enumeration (both None or equal
    integers), including vocabularies missing a character."""
    from prefix_filter_spark.operators.unigram import viterbi_score_fp

    scores = {c: -4_000_000 for c in "abc" if c != drop_char}
    scores.update({p: -2_000_000 - 10_007 * len(p) for p in extra})
    got = viterbi_score_fp(word, scores, 3)
    want = _enumerate_best_fp(word, scores, 3)
    assert got == want


def test_viterbi_score_fp_unsegmentable():
    from prefix_filter_spark.operators.unigram import viterbi_score_fp

    assert viterbi_score_fp("axe", {"a": -1, "e": -1}, 4) is None


def test_word_viterbi_scores_distributed(spark):
    """Distributed scorer == pure-Python twin over the same corpus, on
    any partitioning; unsegmentable words are dropped on both sides."""
    from prefix_filter_spark.operators.unigram import (
        viterbi_score_fp,
        word_viterbi_scores,
    )

    scores = {c: -4_158_883 for c in "lownewidrst"}
    scores.update({"low": -3_178_054, "new": -3_178_054, "est": -3_178_054,
                   "er": -3_465_736, "wi": -3_465_736})
    del scores["d"]  # makes "wide"/"wider"/"widest" unsegmentable
    wc = _word_counts_py(CORPUS)
    want = {}
    for w, c in wc.items():
        s = viterbi_score_fp(w, scores, 3)
        if s is not None:
            want[w] = (c, s)
    for parts in (1, 5):
        got = {
            r["w"]: (int(r["cnt"]), int(r["viterbi_fp"]))
            for r in word_viterbi_scores(
                _corpus_df(spark, parts), scores
            ).collect()
        }
        assert got == want
    assert "wide" not in want and "low" in want


def test_join_encode_equals_batch(spark):
    """VERDICT r4 item 3 gate (unigram twin): encode_unigram_join ==
    encode_unigram on a duplicate-heavy corpus, empty docs included."""
    from prefix_filter_spark.operators.unigram import encode_unigram_join

    base = _corpus_df(spark, 3)
    pieces = train_unigram(base, vocab_size=15, seed_size=30)
    rows = [(i, line) for i, line in enumerate(CORPUS * 4 + [""])]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string"
    ).repartition(5)
    batch = {
        r["doc_id"]: [list(p) for p in r["pieces"]]
        for r in encode_unigram(docs, pieces).collect()
    }
    join = {
        r["doc_id"]: [list(p) for p in r["pieces"]]
        for r in encode_unigram_join(docs, pieces).collect()
    }
    assert batch == join and len(batch) == len(rows)


def test_bcast_encode_equals_batch(spark):
    """encode_unigram_bcast (distinct-word Viterbi once -> broadcast
    dict -> map-only lookup) == encode_unigram, empty docs included."""
    from prefix_filter_spark.operators.unigram import encode_unigram_bcast

    base = _corpus_df(spark, 3)
    pieces = train_unigram(base, vocab_size=15, seed_size=30)
    rows = [(i, line) for i, line in enumerate(CORPUS * 4 + [""])]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(5)
    batch = {
        r["doc_id"]: [list(p) for p in r["pieces"]]
        for r in encode_unigram(docs, pieces).collect()
    }
    bcast = {
        r["doc_id"]: [list(p) for p in r["pieces"]]
        for r in encode_unigram_bcast(docs, pieces).collect()
    }
    assert batch == bcast and len(batch) == len(rows)
