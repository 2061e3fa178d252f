"""Distributed BPE training (operators/bpe.py) vs a sequential
pure-Python reference — the naive-vs-optimized cross-check strategy the
reference repo uses for its kernels (SURVEY.md §5)."""

from collections import Counter

from prefix_filter_spark.operators.bpe import (
    END,
    encode_bpe,
    train_bpe,
    word_counts,
)


def _ref_bpe(word_cnt: dict[str, int], num_merges: int):
    """Sequential reference: Sennrich et al. alg. 1 with the same
    deterministic tie-break (max by (count, left, right))."""
    vocab = {tuple(list(w) + [END]): c for w, c in word_cnt.items()}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (a, b), total = max(
            pairs.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1])
        )
        if total < 2:
            break
        merges.append((a, b, total))
        new_vocab = {}
        for syms, c in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new_vocab[tuple(res)] = new_vocab.get(tuple(res), 0) + c
        vocab = new_vocab
    return merges, vocab


def _corpus(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_matches_reference_on_classic_example(spark):
    """The canonical low/lower/newest/widest example."""
    texts = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    docs = _corpus(spark, [" ".join(texts)])
    wc = {r["w"]: r["cnt"] for r in word_counts(docs).collect()}
    want, _ = _ref_bpe(wc, 10)
    got = train_bpe(docs, num_merges=10)
    assert got == want
    # ('t', '</w>') and ('e', 's') both occur 9 times; the documented
    # (count, left, right) tie-break picks 't' > 'e'
    assert got[0][0:2] == ("t", END)


def test_matches_reference_on_messy_corpus(spark):
    texts = [
        "the cat sat on the mat",
        "the cats sat on the mats",
        "aaa aaaa aa aaa",
        "repeat repeat repeat repeated repeating",
        "xyz",
    ]
    docs = _corpus(spark, texts)
    wc = {r["w"]: r["cnt"] for r in word_counts(docs).collect()}
    want, ref_vocab = _ref_bpe(wc, 25)
    got = train_bpe(docs, num_merges=25)
    assert got == want

    # encoding the training words must reproduce the final vocab's
    # symbol sequences (lowest-rank-first == iterative retraining)
    enc = {
        r["doc_id"]: r["bpe_tokens"]
        for r in encode_bpe(docs, got).collect()
    }
    ref_seq = {}
    for syms, _ in ref_vocab.items():
        # reconstruct the word from its symbols
        w = "".join(syms).removesuffix(END)
        ref_seq[w] = list(syms)
    for i, t in enumerate(texts):
        want_toks = []
        for w in t.split(" "):
            want_toks.extend(ref_seq[w])
        assert enc[i] == want_toks, (i, enc[i], want_toks)


def test_partitioning_invariance(spark):
    texts = ["the quick brown fox " * 3, "the slow brown dog " * 5]
    a = train_bpe(_corpus(spark, texts), num_merges=8)
    b = train_bpe(_corpus(spark, texts).repartition(13), num_merges=8)
    assert a == b


def test_early_stop_when_no_repeats(spark):
    # every pair unique -> total < 2 everywhere -> no merges
    docs = _corpus(spark, ["ab cd ef"])
    assert train_bpe(docs, num_merges=5) == []


def test_vectorized_encode_equals_reference_loop(spark):
    """encode_udf(vectorized=True) — the NumPy lockstep batch encoder —
    must produce bit-identical token arrays to the per-word Python
    reference loop (vectorized=False), including overlapping-repeat
    words ('aaaa') and characters outside the merge table."""
    from prefix_filter_spark.operators.bpe import encode_udf

    texts = [
        "the cat sat on the mat",
        "aaa aaaa aaaaaaa a",
        "repeat repeat repeated repeating",
        "unseen zz qqq xyzzy",
        "low lower newest widest " * 4,
    ]
    docs = _corpus(spark, texts)
    merges = train_bpe(docs, num_merges=30)
    assert len(merges) > 10
    from pyspark.sql import functions as F

    fast = encode_udf(merges, spark, vectorized=True)
    ref = encode_udf(merges, spark, vectorized=False)
    out = docs.select(
        "doc_id",
        fast(F.col("text")).alias("a"),
        ref(F.col("text")).alias("b"),
    ).collect()
    for r in out:
        assert r["a"] == r["b"], r["doc_id"]


def test_encode_words_numpy_fuzz():
    """Pure-python fuzz of the lockstep encoder vs the sequential
    reference on random words over a small alphabet (no Spark)."""
    import random

    from prefix_filter_spark.operators.bpe import encode_words_numpy

    def ref_encode(w, merges):
        r = {(a, b): i for i, (a, b, _) in enumerate(merges)}
        s = list(w) + [END]
        while len(s) >= 2:
            best = min(
                range(len(s) - 1),
                key=lambda i: r.get((s[i], s[i + 1]), 1 << 30),
            )
            if (s[best], s[best + 1]) not in r:
                break
            s[best : best + 2] = [s[best] + s[best + 1]]
        return s

    rng = random.Random(7)
    wc: dict[str, int] = {}
    for _ in range(300):
        w = "".join(rng.choice("abcd") for _ in range(rng.randrange(1, 12)))
        wc[w] = wc.get(w, 0) + rng.randrange(1, 8)
    merges, _ = _ref_bpe(wc, 40)
    words = list(wc) + ["aaaaaa", "ü§9", "zzz"]
    got = encode_words_numpy(words, merges)
    want = [ref_encode(w, merges) for w in words]
    assert got == want


def test_non_monotone_merge_table_rejected():
    """The lockstep encoder's batch semantics require rank monotonicity
    (guaranteed for trained tables); a hand-built table whose operand is
    produced by a LATER merge must be rejected, not silently diverge
    from the per-word reference loop."""
    import pytest

    from prefix_filter_spark.operators.bpe import _encode_tables

    with pytest.raises(ValueError, match="non-monotone"):
        _encode_tables([("ab", "a", 5), ("a", "b", 4)])
    # monotone tables (operand from an earlier merge) are fine
    _encode_tables([("a", "b", 5), ("ab", "a", 4)])
    # operands never produced by any merge are inert, not an error
    _encode_tables([("xy", "z", 3)])
    # duplicate outputs: a symbol produced by SEVERAL merges must use
    # its EARLIEST producer for the check — 'abc' is produced at rank 0
    # ('a'+'bc') before being used at rank 1, and produced again at
    # rank 2; a last-producer-wins rank map falsely rejected this
    # (review finding, reachable in real trained tables where e.g.
    # 'r'+'es' and 're'+'s' both yield 'res')
    _encode_tables([("a", "bc", 10), ("abc", "d", 9), ("ab", "c", 8)])


def test_reference_loop_accepts_non_monotone(spark):
    """vectorized=False is the naive per-word reference loop, which
    encodes non-monotone tables correctly — only the lockstep batch
    path is gated on monotonicity."""
    from prefix_filter_spark.operators.bpe import encode_udf

    bad = [("ab", "a", 5), ("a", "b", 4)]
    fn = encode_udf(bad, spark, vectorized=False)  # must not raise
    import pyspark.sql.functions as F

    df = spark.createDataFrame([("d1", "abab")], "doc_id string, text string")
    [row] = df.select(fn(F.col("text")).alias("t")).collect()
    # reference semantics: merge (a,b) first (rank 0 by list position),
    # then the newly-formed (ab,a) pair outranks the remaining (a,b) —
    # exactly the mid-word switch the lockstep path cannot reproduce,
    # hence reject-there / allow-here
    assert row["t"] == ["aba", "b", "</w>"]
