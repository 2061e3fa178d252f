"""Dedup / similarity / text operators vs exact oracles (DuckDB + brute force)."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from prefix_filter_spark.operators import dedup, similarity, text

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_ngram_jaccard_matches_duckdb(docs):
    got = (
        dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.8)
        .orderBy("d1", "d2")
        .toPandas()
    )
    want = duckdb.sql(
        f"""
        WITH w AS (SELECT doc_id, list_filter(string_split(lower(text),' '), x->x<>'') ws
                   FROM '{SF}/documents.parquet'),
        sh AS (SELECT DISTINCT doc_id,
                 unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws)-1)]) AS s
               FROM w),
        cnts AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
        pairs AS (SELECT a.doc_id d1, b.doc_id d2, count(*) shared
                  FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id<b.doc_id GROUP BY 1,2)
        SELECT d1, d2, shared, ca.n n1, cb.n n2,
               shared::double/(ca.n+cb.n-shared) jaccard
        FROM pairs JOIN cnts ca ON ca.doc_id=d1 JOIN cnts cb ON cb.doc_id=d2
        WHERE shared::double/(ca.n+cb.n-shared) >= 0.8 ORDER BY d1, d2
        """
    ).df()
    assert len(got) == len(want) and len(got) > 0
    assert got["d1"].tolist() == want["d1"].tolist()
    assert got["shared"].tolist() == want["shared"].tolist()
    assert np.allclose(got["jaccard"], want["jaccard"])


def test_minhash_lsh_finds_all_high_jaccard_pairs(docs):
    exact = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.8).toPandas()
    lsh = dedup.minhash_lsh_pairs(docs, threshold=0.8).toPandas()
    e = set(zip(exact["d1"], exact["d2"]))
    l = set(zip(lsh["d1"], lsh["d2"]))
    assert l == e  # catch prob ~1-1e-7 at j>=0.8 with 32x4 banding


def test_simhash_pairs_cover_near_dups(docs):
    """SimHash catches near-dups among docs long enough for stable bit
    votes (short docs flip ~half the bits on a one-word edit — that
    regime belongs to MinHash, see dedup.simhash_pairs docstring)."""
    long_docs = docs.where(F.size(F.split(F.col("text"), " ")) >= 48)
    exact = dedup.ngram_jaccard_pairs(long_docs, n=3, threshold=0.9).toPandas()
    sim = dedup.simhash_pairs(long_docs, max_hamming=8).toPandas()
    s = set(zip(sim["d1"], sim["d2"]))
    missed = [p for p in zip(exact["d1"], exact["d2"]) if p not in s]
    assert len(exact) > 0
    assert len(missed) <= max(1, len(exact) // 5), missed
    # and no wild false positives: every reported pair is within distance
    assert (sim["hamming"] <= 8).all()


def test_exact_duplicates_empty_on_unique_corpus(docs):
    assert dedup.exact_duplicates(docs).count() == 0
    dup = docs.union(docs.limit(5))
    got = dedup.exact_duplicates(dup).orderBy("keep_doc_id").toPandas()
    assert len(got) == 5 and (got["group_size"] == 2).all()


def test_cosine_topk_matches_numpy(emb, spark):
    queries = emb.limit(8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = similarity.cosine_topk(emb, queries, k=5).toPandas()
    ep = emb.toPandas()
    mat = np.vstack(ep["embedding"].to_numpy()).astype(np.float64)
    ids = ep["vec_id"].to_numpy()
    norms = np.linalg.norm(mat, axis=1)
    qp = queries.toPandas()
    for _, qrow in qp.iterrows():
        qv = np.asarray(qrow["embedding"], dtype=np.float64)
        cos = (mat @ qv) / (norms * np.linalg.norm(qv))
        cos[ids == qrow["query_id"]] = -np.inf
        top = got[got["query_id"] == qrow["query_id"]].sort_values("rank")
        # sort by (-cos, vec_id) to mirror the tie-break
        order = np.lexsort((ids, -cos))[:5]
        assert top["vec_id"].tolist() == ids[order].tolist()
        assert np.allclose(top["cosine"].to_numpy(), cos[order], atol=1e-9)


def test_srp_ann_recall(emb):
    """Band width sets the recall/pruning point: this corpus's nearest
    neighbors are only cos~0.4 (no planted clusters), so use 16x4-bit
    bands (theoretical recall ~0.93 at that angle). Production tuning:
    wider bands for genuinely-close duplicates, finer for loose ANN."""
    queries = emb.limit(16).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = similarity.cosine_topk(emb, queries, k=5).toPandas()
    ann = similarity.srp_ann_topk(emb, queries, k=5, bands=16).toPandas()
    hits = 0
    for qid in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(ann[ann["query_id"] == qid]["vec_id"])
        hits += len(e & a)
    recall = hits / len(exact)
    assert recall >= 0.6, recall
    # reported cosines are exact (rerank is exact) — spot-check one value
    merged = ann.merge(exact, on=["query_id", "vec_id"], suffixes=("_a", "_e"))
    assert np.allclose(merged["cosine_a"], merged["cosine_e"])


def test_quality_and_fingerprint_deterministic(docs):
    q1 = text.quality_score(docs).orderBy("doc_id").toPandas()
    q2 = text.quality_score(docs).orderBy("doc_id").toPandas()
    assert q1.equals(q2)
    fp = text.doc_fingerprint(docs).toPandas()
    assert fp["fingerprint"].nunique() == len(fp)
    # DuckDB agrees on the md5 fingerprint (exact cross-engine)
    want = duckdb.sql(
        f"""SELECT doc_id, md5(array_to_string(list_filter(string_split(lower(text),' '), x->x<>''),' ')) f
            FROM '{SF}/documents.parquet' ORDER BY doc_id"""
    ).df()
    got = fp.sort_values("doc_id").reset_index(drop=True)
    assert got["fingerprint"].tolist() == want["f"].tolist()


def test_lang_id_mechanics(spark, docs):
    cents = text.train_lang_centroids(docs.limit(200))
    assert set(cents) == {"en", "zh", "es", "de", "fr"}
    pred = text.predict_lang(docs.limit(50), cents).toPandas()
    assert len(pred) == 50 and pred["lang_pred"].isin(list(cents)).all()


def test_bpe_token_stats(spark, docs):
    """BPE-ish regex pre-tokenization: counts are >= whitespace words
    (punctuation splits off) and exactly match a Python re reference."""
    import re

    out = text.bpe_token_stats(docs.limit(50)).toPandas()
    assert (out["n_bpe_tokens"] >= out["n_words"]).all()
    raw = docs.limit(50).select("doc_id", "text").toPandas()
    pat = re.compile(r"'[a-z]+| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+")
    want = {r.doc_id: len(pat.findall(r.text.lower())) for r in raw.itertuples()}
    got = dict(zip(out["doc_id"], out["n_bpe_tokens"]))
    assert got == want


def test_winnow_fingerprints(spark, docs):
    """Winnowing invariants: identical docs share all fingerprints, a
    local edit preserves most (the rolling-hash locality property the
    md5 whole-doc fingerprint lacks), and per-doc counts match a pure
    Python winnowing reference."""
    import hashlib

    sub = docs.limit(20)
    out = {r["doc_id"]: set(r["fingerprints"])
           for r in text.winnow_fingerprints(sub).collect()}
    raw = {r["doc_id"]: r["text"] for r in sub.select("doc_id", "text").collect()}
    k, w = 8, 16
    for did, t in raw.items():
        norm = " ".join(x for x in t.lower().split(" ") if x)
        grams = [hashlib.md5(norm[i:i + k].encode()).hexdigest()[:16]
                 for i in range(len(norm) - k + 1)]
        if len(grams) >= w:
            want = {min(grams[j:j + w]) for j in range(len(grams) - w + 1)}
        elif grams:
            want = {min(grams)}
        else:
            want = set()
        assert out[did] == want, did
    # locality: append a sentence -> old fingerprints mostly survive
    base = next(iter(raw.values()))
    two = spark.createDataFrame(
        [("a", base, "s"), ("b", base + " appended tail words here", "s")],
        "doc_id string, text string, source string",
    )
    fps = {r["doc_id"]: set(r["fingerprints"])
           for r in text.winnow_fingerprints(two).collect()}
    inter = len(fps["a"] & fps["b"]) / max(len(fps["a"]), 1)
    assert inter > 0.8, inter


def test_ivf_ann_recall_and_determinism(spark):
    """IVF index: deterministic under the seeded trainer, recall >= 0.7
    vs exact top-k even on isotropic (worst-case) embeddings at
    nprobe=10/nlist=16."""
    from prefix_filter_spark.operators import similarity as sim
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = sorted(map(tuple, sim.ivf_ann_topk(emb, q, k=5, nprobe=10)
                   .select("query_id", "vec_id", "rank").collect()))
    b = sorted(map(tuple, sim.ivf_ann_topk(emb, q, k=5, nprobe=10)
                   .select("query_id", "vec_id", "rank").collect()))
    assert a == b, "IVF result must be deterministic"
    exact = set(map(tuple, sim.cosine_topk(emb, q, k=5)
                    .select("query_id", "vec_id").collect()))
    got = set((r[0], r[1]) for r in a)
    assert len(exact & got) / len(exact) >= 0.7


def test_srp_near_dup_equals_exact_all_pairs(spark):
    """The banded scale path finds exactly the pairs the O(n^2) exact
    operator finds (planted near-copies over isotropic noise), at a
    candidate count far below all-pairs."""
    import numpy as np

    from prefix_filter_spark.operators.dedup import (
        embedding_near_dups,
        srp_near_dup_pairs,
    )

    rng = np.random.default_rng(5)
    base = rng.standard_normal((400, 64))
    near = base[:80].copy()
    near[:, 0] *= 1.25  # cosine ~0.998 vs natural max ~0.5
    rows = [(i, base[i].tolist()) for i in range(400)] + [
        (10_000 + i, near[i].tolist()) for i in range(80)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["v1"], r["v2"])
        for r in srp_near_dup_pairs(emb, threshold=0.95, bands=8).collect()
    }
    want = {
        (r["v1"], r["v2"])
        for r in embedding_near_dups(emb, threshold=0.95).collect()
    }
    assert want == {(i, 10_000 + i) for i in range(80)}
    assert got == want


def test_semdedup_equals_exact_all_pairs(spark):
    """The cluster-scoped path (SemDeDup) finds exactly the pairs the
    O(n^2) exact operator finds on planted near-copies — near-dups land
    in the same k-means cluster — and the output is deterministic."""
    import numpy as np

    from prefix_filter_spark.operators.dedup import (
        embedding_near_dups,
        semdedup_pairs,
    )

    rng = np.random.default_rng(5)
    base = rng.standard_normal((400, 64))
    near = base[:80].copy()
    near[:, 0] *= 1.25
    rows = [(i, base[i].tolist()) for i in range(400)] + [
        (10_000 + i, near[i].tolist()) for i in range(80)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["v1"], r["v2"])
        for r in semdedup_pairs(emb, threshold=0.95, nlist=8).collect()
    }
    want = {
        (r["v1"], r["v2"])
        for r in embedding_near_dups(emb, threshold=0.95).collect()
    }
    assert want == {(i, 10_000 + i) for i in range(80)}
    assert got == want
    again = {
        (r["v1"], r["v2"])
        for r in semdedup_pairs(emb, threshold=0.95, nlist=8).collect()
    }
    assert again == got, "semdedup must be deterministic"


def test_semdedup_drop_rule(spark):
    """Drop the centroid-CLOSER member of each near-dup pair (the paper
    keeps the least-redundant example); at least one member of every
    pair survives, and drops are a subset of pair members."""
    import numpy as np

    from prefix_filter_spark.operators.dedup import (
        semdedup_drop_ids,
        semdedup_pairs,
    )

    rng = np.random.default_rng(5)
    base = rng.standard_normal((400, 64))
    near = base[:80].copy()
    near[:, 0] *= 1.25
    rows = [(i, base[i].tolist()) for i in range(400)] + [
        (10_000 + i, near[i].tolist()) for i in range(80)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = [
        (r["v1"], r["v2"])
        for r in semdedup_pairs(emb, threshold=0.95, nlist=8).collect()
    ]
    drops = {r["vec_id"] for r in semdedup_drop_ids(emb, threshold=0.95, nlist=8).collect()}
    members = {v for p in pairs for v in p}
    assert drops, "planted dups must produce drops"
    assert drops <= members
    for v1, v2 in pairs:
        assert not (v1 in drops and v2 in drops), (
            f"pair ({v1},{v2}) lost both members"
        )


def test_repetition_scores_reference(spark):
    """Hand-computed duplicate-n-gram fractions on crafted docs."""
    from prefix_filter_spark.operators.text import repetition_scores

    rows = [
        (1, "a a a a", "s"),              # words: 4 total / 1 distinct
        (2, "a b a b a", "s"),            # 2-grams: 4 total / 2 distinct
        (3, "x y z w", "s"),              # no repetition at all
        (4, "solo", "s"),                 # too short for any n-gram
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["doc_id"]: r for r in repetition_scores(df).collect()}
    assert got[1]["dup_word_frac"] == 0.75
    assert got[1]["dup_2gram_frac"] == round(1 - 1 / 3, 6)
    assert got[2]["dup_2gram_frac"] == 0.5
    assert got[2]["dup_3gram_frac"] == round(1 - 2 / 3, 6)
    assert got[3]["dup_word_frac"] == 0.0
    assert got[3]["dup_3gram_frac"] == 0.0
    assert got[4]["dup_2gram_frac"] == 0.0 and got[4]["n_words"] == 1


def test_repetition_plan_is_map_only(spark, documents):
    from prefix_filter_spark.operators.text import repetition_scores

    plan = (
        repetition_scores(documents)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


def test_cosine_kernel_bit_identical_to_catalyst(emb, spark):
    """The mapInPandas cumsum kernel must reproduce the Catalyst
    sequential fold (cosine_expr) BIT-FOR-BIT — this is what keeps the
    DuckDB hash gates green after the round-4 vectorization."""
    queries = emb.limit(4).select(F.col("vec_id").alias("query_id"), "embedding")
    got = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in similarity.cosine_topk(emb, queries, k=7).collect()
    }
    q = F.broadcast(queries).alias("q")
    e = emb.alias("e")
    want = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in (
            e.join(q, F.col("q.query_id") != F.col("e.vec_id"))
            .select(
                F.col("q.query_id").alias("query_id"),
                F.col("e.vec_id").alias("vec_id"),
                similarity.cosine_expr(
                    F.col("q.embedding"), F.col("e.embedding")
                ).alias("cosine"),
            )
            .collect()
        )
    }
    assert got and all(got[k] == want[k] for k in got)  # exact ==, no tolerance


def test_pair_cosine_kernel_bit_identical_to_catalyst(emb, spark):
    """cosine_pair_udf (the bucketed-verify kernel) must equal the
    Catalyst fold bit-for-bit on a joined pair stream."""
    a = emb.select(F.col("vec_id").alias("v1"), F.col("embedding").alias("e1"))
    b = emb.select(F.col("vec_id").alias("v2"), F.col("embedding").alias("e2"))
    pairs = a.join(b, F.col("v1") < F.col("v2")).limit(500)
    got = {
        (r["v1"], r["v2"]): r["c"]
        for r in pairs.select(
            "v1", "v2", similarity.cosine_pair_udf()(F.col("e1"), F.col("e2")).alias("c")
        ).collect()
    }
    want = {
        (r["v1"], r["v2"]): r["c"]
        for r in pairs.select(
            "v1", "v2", similarity.cosine_expr(F.col("e1"), F.col("e2")).alias("c")
        ).collect()
    }
    assert got and all(got[k] == want[k] for k in got)


def test_winnow_spans_shared_substring_guarantee(spark):
    """Robust winnowing's paper guarantee: documents sharing a
    substring longer than w+k-1 select IDENTICAL (fingerprint,
    relative-offset) pairs inside the shared region — the property that
    makes position-level overlap location work."""
    import random

    from prefix_filter_spark.operators import text as T

    rng = random.Random(5)
    shared = " ".join(f"x{rng.randint(0, 999)}" for _ in range(60))
    pre_a = " ".join(f"a{rng.randint(0, 999)}" for _ in range(30))
    pre_b = " ".join(f"b{rng.randint(0, 999)}" for _ in range(45))
    docs = spark.createDataFrame(
        [(1, "s", f"{pre_a} {shared}"), (2, "s", f"{pre_b} {shared}")],
        "doc_id long, source string, text string",
    )
    k, w = 8, 16
    rows = {r["doc_id"]: r["spans"] for r in T.winnow_spans(docs, k, w).collect()}
    # offsets of the shared region differ per doc; normalize to it
    off = {1: len(pre_a) + 1, 2: len(pre_b) + 1}
    inner = {}
    for d, spans in rows.items():
        start = off[d] + w + k - 2  # skip the boundary-straddling prefix
        end = off[d] + len(shared) - k
        inner[d] = {(s["fp"], s["pos"] - off[d]) for s in spans
                    if start <= s["pos"] <= end}
    assert inner[1] and inner[1] == inner[2]


def test_winnow_spans_value_set_matches_plain_and_density(spark):
    import random

    from prefix_filter_spark.operators import text as T

    rng = random.Random(9)
    txt = " ".join(f"w{rng.randint(0, 9999)}" for _ in range(400))
    docs = spark.createDataFrame(
        [(1, "s", txt)], "doc_id long, source string, text string"
    )
    k, w = 8, 16
    spans = T.winnow_spans(docs, k, w).collect()[0]["spans"]
    plain = set(T.winnow_fingerprints(docs, k, w).collect()[0]["fingerprints"])
    got_vals = {s["fp"] for s in spans}
    assert got_vals == plain  # every window-min value, robust or not
    # positions valid + expected density 2/(w+1) within 2x
    n_grams = len(txt) - k + 1
    assert all(0 <= s["pos"] < n_grams for s in spans)
    dens = len(spans) / n_grams
    assert 0.5 * 2 / (w + 1) < dens < 2.5 * 2 / (w + 1), dens


def test_winnow_spans_short_doc(spark):
    from prefix_filter_spark.operators import text as T

    docs = spark.createDataFrame(
        [(1, "s", "tiny text"), (2, "s", "ab")],
        "doc_id long, source string, text string",
    )
    rows = {r["doc_id"]: r["spans"] for r in T.winnow_spans(docs, 8, 16).collect()}
    assert len(rows[1]) == 1  # shorter than one window: single min
    assert rows[2] == []  # shorter than k: nothing


def test_cosine_topk_preserves_string_ids(spark):
    """The mapInPandas rewrite must keep working for non-long id
    columns (the original Catalyst version was type-generic)."""
    import numpy as np

    rng = np.random.default_rng(8)
    rows = [(f"doc{i}", rng.standard_normal(8).tolist()) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    q = emb.limit(2).select(F.col("vec_id").alias("query_id"), "embedding")
    got = similarity.cosine_topk(emb, q, k=3).collect()
    assert len(got) == 6
    assert all(isinstance(r["vec_id"], str) and r["vec_id"].startswith("doc") for r in got)
    assert all(r["query_id"] != r["vec_id"] for r in got)
