"""End-to-end curation funnel (operators/curation.py): planted
documents that each stage — and only that stage — must remove, plus
determinism and partition invariance of the whole composition."""

from pyspark.sql import functions as F

from prefix_filter_spark.operators.curation import (
    CurationConfig,
    curate_corpus,
)

_GOOD = (
    "the quick brown fox jumps over the lazy dog while a small bird "
    "watches from the old oak tree and the wind moves softly through "
    "green leaves near the river bank in the warm light of morning"
)
_BOILER = "subscribe to our newsletter for more updates"

# distinct base stories so only the INTENDED sharing exists — a common
# base would collapse the exact-dup / contaminated plants into doc 1's
# near-dup cluster and test the wrong stage
_DUP = (
    "deep in the quiet valley the miller ground his grain each day as "
    "carts rolled past the stone bridge and children played along the "
    "dusty road between the market square and the tall white church"
)
_CONTAM = (
    "far across the open plains the riders drove their herds toward "
    "the distant hills where rain clouds gathered over dry fields and "
    "the long summer finally gave way to the first cool days of autumn"
)


def _corpus(spark):
    rows = [
        # 1: survives everything (carries the boilerplate line + PII)
        (1, f"{_GOOD} one\n{_BOILER}\ncontact me at bob@example.com now", "en"),
        # 2: killed by lang filter
        (2, f"{_GOOD} zwei", "de"),
        # 3: killed by quality filter (one junk word, no stopwords)
        (3, "zzzzzz", "en"),
        # 4/5: exact duplicates — 5 dropped (4 is the min doc_id)
        (4, f"{_DUP}\n{_BOILER}", "en"),
        (5, f"{_DUP}\n{_BOILER}", "en"),
        # 6: near duplicate of 1's core text (one word differs)
        (6, f"{_GOOD} one extra", "en"),
        # 7: contaminated (contains a benchmark trigram passage)
        (7, f"{_CONTAM} held out evaluation passage here", "en"),
        # 8: clean independent survivor, shares the boilerplate line
        (8, f"a completely different and rather long story about ships "
            f"and storms told by an old sailor to the young crew at "
            f"night under bright stars on calm seas\n{_BOILER}", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _benchmark(spark):
    return spark.createDataFrame(
        [(100, "held out evaluation passage here")], "doc_id long, text string"
    )


_CFG = CurationConfig(
    keep_langs=("en",),
    min_quality=0.4,
    redact_pii=True,
    boilerplate_min_docs=3,
    exact_dedup=True,
    near_dup_threshold=0.7,
    shingle_n=3,
)


def test_funnel_drops_exactly_the_planted_docs(spark):
    docs = _corpus(spark)
    out, report = curate_corpus(docs, _CFG, benchmark=_benchmark(spark), audit=True)
    rows = {r["doc_id"]: r for r in out.collect()}
    # 2 lang, 3 quality, 5 exact-dup (4 is the min id of the pair),
    # 6 near-dup of 1 (1 is the min id of its cluster), 7 contaminated
    assert sorted(rows) == [1, 4, 8]
    # stage log: every configured stage present, in canonical order
    names = [s for s, _, _ in report]
    assert names == [
        "lang_filter", "quality_filter", "pii_redact", "boilerplate",
        "exact_dedup", "near_dedup", "decontaminate",
    ]
    # funnel is contiguous: rows_in of stage k == rows_out of k-1
    for (_, _, prev_out), (_, nxt_in, _) in zip(report, report[1:]):
        assert nxt_in == prev_out
    by = dict((s, (i, o)) for s, i, o in report)
    assert by["lang_filter"] == (8, 7)
    assert by["quality_filter"] == (7, 6)
    assert by["pii_redact"] == (6, 6)      # row-preserving rewrite
    assert by["boilerplate"] == (6, 6)     # rewrites text, drops no docs
    assert by["exact_dedup"] == (6, 5)
    assert by["near_dedup"] == (5, 4)
    assert by["decontaminate"] == (4, 3)


def test_text_rewrites_applied_to_survivors(spark):
    docs = _corpus(spark)
    out, _ = curate_corpus(docs, _CFG, benchmark=_benchmark(spark))
    rows = {r["doc_id"]: r["text"] for r in out.collect()}
    # PII replaced, case and non-PII bytes preserved
    assert "<EMAIL>" in rows[1] and "bob@example.com" not in rows[1]
    # boilerplate line stripped from every surviving doc that had it
    for t in rows.values():
        assert _BOILER not in t
    # non-boilerplate content intact
    assert rows[1].startswith("the quick brown fox")


def test_funnel_deterministic_and_partition_invariant(spark):
    docs = _corpus(spark)
    bench = _benchmark(spark)
    a, _ = curate_corpus(docs, _CFG, benchmark=bench)
    b, _ = curate_corpus(docs.repartition(7), _CFG, benchmark=bench)
    c, _ = curate_corpus(docs, _CFG, benchmark=bench)
    ka = sorted((r["doc_id"], r["text"]) for r in a.collect())
    kb = sorted((r["doc_id"], r["text"]) for r in b.collect())
    kc = sorted((r["doc_id"], r["text"]) for r in c.collect())
    assert ka == kb == kc


def test_stage_toggles(spark):
    docs = _corpus(spark)
    # everything off -> identity (schema and rows unchanged)
    cfg = CurationConfig(
        keep_langs=None, min_quality=None, redact_pii=False,
        boilerplate_min_docs=None, exact_dedup=False,
        near_dup_threshold=None,
    )
    out, report = curate_corpus(docs, cfg, audit=True)
    assert report == []
    assert out.columns == docs.columns
    assert out.count() == docs.count()
    # single stage: exact dedup alone keeps the min id of the 4/5 pair
    cfg2 = CurationConfig(
        keep_langs=None, min_quality=None, redact_pii=False,
        boilerplate_min_docs=None, exact_dedup=True,
        near_dup_threshold=None,
    )
    out2, _ = curate_corpus(docs, cfg2)
    ids = sorted(r["doc_id"] for r in out2.collect())
    assert 4 in ids and 5 not in ids


def test_map_only_prefix_has_no_exchange(spark):
    """Stages 1-3 (lang, quality, PII) must fuse into one scan: the
    funnel's plan with only those stages on contains no Exchange and
    no Python eval node."""
    docs = _corpus(spark)
    cfg = CurationConfig(
        keep_langs=("en",), min_quality=0.4, redact_pii=True,
        boilerplate_min_docs=None, exact_dedup=False,
        near_dup_threshold=None,
    )
    out, _ = curate_corpus(docs, cfg)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_funnel_equals_manual_chain(spark):
    """VERDICT r4 item 8 gate: the funnel re-implements stage WIRING,
    not stage semantics — running the same config as individually
    chained operator calls must produce bit-identical survivors
    (doc_id, text, lang). A future edit to any stage cannot silently
    fork funnel vs standalone behavior without tripping this."""
    from prefix_filter_spark.operators.boilerplate import drop_boilerplate_lines
    from prefix_filter_spark.operators.components import connected_components
    from prefix_filter_spark.operators.decontaminate import contaminated_docs
    from prefix_filter_spark.operators.dedup import (
        exact_duplicates,
        minhash_lsh_pairs,
    )
    from prefix_filter_spark.operators.pii import redact_pii
    from prefix_filter_spark.operators.text import quality_exprs

    docs = _corpus(spark)
    bench = _benchmark(spark)
    got, _ = curate_corpus(docs, _CFG, benchmark=bench)

    # the same funnel, hand-chained from the public operators
    cur = docs.where(F.col("lang").isin("en"))
    cur = cur.where(quality_exprs("text")["quality"] >= F.lit(0.4))
    cur = redact_pii(cur, "text")
    cur = drop_boilerplate_lines(cur, "text", min_docs=3).select(*docs.columns)
    dup_drop = (
        exact_duplicates(cur)
        .select(F.explode("members").alias("doc_id"), "keep_doc_id")
        .where(F.col("doc_id") != F.col("keep_doc_id"))
        .select("doc_id")
    )
    cur = cur.join(dup_drop, "doc_id", "left_anti")
    pairs = minhash_lsh_pairs(
        cur, threshold=0.7, num_perm=128, bands=32, n=3, seed=42
    ).select("d1", "d2")
    comp = connected_components(pairs, "d1", "d2")
    drop = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    cur = cur.join(drop, "doc_id", "left_anti")
    bad = contaminated_docs(spark, cur, bench, n=3, min_hits=1).select("doc_id")
    want = cur.join(bad, "doc_id", "left_anti")

    a = sorted(map(tuple, got.select("doc_id", "text", "lang").collect()))
    b = sorted(map(tuple, want.select("doc_id", "text", "lang").collect()))
    assert a == b and len(a) > 0
