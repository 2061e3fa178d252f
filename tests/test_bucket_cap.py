"""Hot-bucket cap for LSH candidate generation
(operators/dedup._bucket_candidate_pairs) — round-3 verdict item #2:
the documented quadratic hot-bucket caveat must be mitigated in code,
not prose. The cap must (a) keep the pair set bit-identical to the
uncapped oracle, (b) bound per-cell pair work regardless of bucket
size, and (c) actually redistribute cells across tasks (an explicit
repartition in the plan)."""

import numpy as np
from pyspark.sql import functions as F

from prefix_filter_spark.operators.dedup import (
    _bucket_candidate_pairs,
    minhash_lsh_pairs,
    srp_near_dup_pairs,
)


def _members(spark, bucket_sizes: dict[int, int]):
    """One bucket per (band=0, h=k) with the given member count; ids are
    globally unique."""
    rows, nxt = [], 0
    for h, n in bucket_sizes.items():
        for _ in range(n):
            rows.append((nxt, 0, h))
            nxt += 1
    return spark.createDataFrame(rows, "doc_id long, band int, h long")


def test_capped_equals_uncapped(spark):
    """Mixed normal + oversized buckets: the capped pair set is exactly
    the uncapped one (grid decomposition never drops or invents a
    pair)."""
    m = _members(spark, {1: 300, 2: 7, 3: 2, 4: 1})
    want = {
        (r["d1"], r["d2"])
        for r in _bucket_candidate_pairs(m, ["band", "h"], "doc_id", cap=None).collect()
    }
    got = {
        (r["d1"], r["d2"])
        for r in _bucket_candidate_pairs(m, ["band", "h"], "doc_id", cap=50).collect()
    }
    assert len(want) == 300 * 299 // 2 + 7 * 6 // 2 + 1
    assert got == want


def test_degenerate_bucket_completes_with_exact_count(spark):
    """The verdict's planted scenario: 10^4 identical docs in one
    bucket. The capped path must complete and emit exactly C(10^4, 2)
    pairs (all of them, each once)."""
    n = 10_000
    m = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(0).alias("band"), F.lit(1).alias("h")
    )
    got = _bucket_candidate_pairs(m, ["band", "h"], "doc_id", cap=512).count()
    assert got == n * (n - 1) // 2


def test_per_cell_work_is_bounded(spark):
    """Recompute the grid assignment the helper uses (same hash, same
    G) and assert no cell's cross-product exceeds the documented
    4*cap^2 worst case — the per-task bound, since the plan
    repartitions by (key, cell)."""
    n, cap = 10_000, 512
    m = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(0).alias("band"), F.lit(1).alias("h")
    )
    G = int(np.ceil(n / cap))
    g = (
        m.select(
            F.pmod(F.xxhash64("doc_id", F.lit(97)), F.lit(G)).alias("g")
        )
        .groupBy("g")
        .count()
        .toPandas()
    )
    sizes = dict(zip(g["g"], g["count"]))
    worst = max(
        sizes.get(i, 0) * sizes.get(j, 0)
        for i in range(G)
        for j in range(i, G)
    )
    assert worst <= 4 * cap * cap, (worst, 4 * cap * cap)
    # and the redistribution is in the plan: an exchange on the cell key
    plan = (
        _bucket_candidate_pairs(m, ["band", "h"], "doc_id", cap=cap)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "cell" in plan


def test_minhash_end_to_end_cap_invariant(spark):
    """minhash_lsh_pairs over a corpus with a 200-copy template doc:
    capped output == uncapped output (rows, not just counts)."""
    base = [
        (i, " ".join(f"w{(i * 7 + k) % 97}" for k in range(40)))
        for i in range(60)
    ]
    dups = [(1000 + i, "the same template page body " + "lorem ipsum dolor " * 10) for i in range(200)]
    docs = spark.createDataFrame(base + dups, "doc_id long, text string")
    kw = dict(threshold=0.8, num_perm=32, bands=8)
    want = {
        tuple(r) for r in minhash_lsh_pairs(docs, bucket_cap=None, **kw)
        .select("d1", "d2", "jaccard").collect()
    }
    got = {
        tuple(r) for r in minhash_lsh_pairs(docs, bucket_cap=16, **kw)
        .select("d1", "d2", "jaccard").collect()
    }
    assert got == want
    assert len(want) >= 200 * 199 // 2  # the planted clique is all found


def test_srp_end_to_end_cap_invariant(spark):
    """srp_near_dup_pairs with a planted near-dup block: capped output
    == uncapped output."""
    rng = np.random.default_rng(11)
    base = rng.standard_normal((150, 64))
    near = base[:30].copy()
    near[:, 0] *= 1.2
    rows = [(i, base[i].tolist()) for i in range(150)] + [
        (500 + i, near[i].tolist()) for i in range(30)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kw = dict(threshold=0.95, bands=8)
    want = {
        tuple(r) for r in srp_near_dup_pairs(emb, bucket_cap=None, **kw)
        .select("v1", "v2").collect()
    }
    got = {
        tuple(r) for r in srp_near_dup_pairs(emb, bucket_cap=8, **kw)
        .select("v1", "v2").collect()
    }
    assert got == want
    assert {(i, 500 + i) for i in range(30)} <= want


def test_semdedup_hot_cluster_cap_invariant(spark):
    """The verdict's 90%-mass-cluster scenario: 450 of 500 vectors are
    near-copies of one direction (all argmax-assigned to the same
    centroid — a skew no re-clustering could split). With a small
    cluster_cap the operator must complete with bounded per-task work
    and return EXACTLY the uncapped output, for both the pair list and
    the drop rule."""
    from prefix_filter_spark.operators.dedup import (
        semdedup_drop_ids,
        semdedup_pairs,
    )

    rng = np.random.default_rng(23)
    hot = np.tile(rng.standard_normal(64), (450, 1)) + 0.001 * rng.standard_normal((450, 64))
    rest = rng.standard_normal((50, 64))
    rows = [(i, hot[i].tolist()) for i in range(450)] + [
        (1000 + i, rest[i].tolist()) for i in range(50)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kw = dict(threshold=0.95, nlist=4, seed=29)
    want = {
        tuple(r)
        for r in semdedup_pairs(emb, cluster_cap=None, **kw)
        .select("v1", "v2", "cluster_id").collect()
    }
    got = {
        tuple(r)
        for r in semdedup_pairs(emb, cluster_cap=64, **kw)
        .select("v1", "v2", "cluster_id").collect()
    }
    assert got == want
    # the 450-copy block is one cluster: all its pairs are present
    assert len(want) >= 450 * 449 // 2
    hot_cluster_ids = {c for (v1, v2, c) in want if v1 < 450 and v2 < 450}
    assert len(hot_cluster_ids) == 1
    drop_want = {r["vec_id"] for r in semdedup_drop_ids(emb, cluster_cap=None, **kw).collect()}
    drop_got = {r["vec_id"] for r in semdedup_drop_ids(emb, cluster_cap=64, **kw).collect()}
    assert drop_got == drop_want
    assert len(drop_want) >= 449  # at most one survivor of the hot block


def test_capped_equals_uncapped_property(spark):
    """Hypothesis-style randomized property (seeded loop — one Spark
    session, many cases): for random bucket multisets and random caps,
    capped pair set == uncapped pair set."""
    import random

    rng = random.Random(42)
    for case in range(6):
        n_buckets = rng.randrange(1, 5)
        sizes = {h: rng.randrange(1, 120) for h in range(n_buckets)}
        cap = rng.randrange(2, 40)
        m = _members(spark, sizes)
        want = {
            (r["d1"], r["d2"])
            for r in _bucket_candidate_pairs(
                m, ["band", "h"], "doc_id", cap=None
            ).collect()
        }
        got = {
            (r["d1"], r["d2"])
            for r in _bucket_candidate_pairs(
                m, ["band", "h"], "doc_id", cap=cap
            ).collect()
        }
        assert got == want, (case, sizes, cap)
        assert len(want) == sum(s * (s - 1) // 2 for s in sizes.values())


def test_cross_corpus_lsh_against(spark):
    """minhash_lsh_pairs_against: planted cross-corpus near-dups are
    found with exact Jaccard, within-corpus dups are NOT answers, and
    the exact scores match a brute-force cross oracle."""
    from prefix_filter_spark.operators.dedup import (
        _shingle_hashes,
        minhash_lsh_pairs_against,
    )

    base = (
        "the quick brown fox jumps over the lazy dog near the old mill "
        "by the river where children play on warm summer afternoons"
    )
    other = (
        "completely different content about ships and storms on the "
        "open sea told by sailors under bright northern stars at night"
    )
    docs = spark.createDataFrame(
        [
            (1, base + " alpha"),          # near-dup of ref 101
            (2, base + " alpha"),          # exact dup of doc 1 (same side!)
            (3, other),                    # matches nothing in ref
        ],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame(
        [
            (101, base + " beta"),
            (102, "unrelated reference text about cooking bread and " 
                  "silent winter mornings in a small mountain village"),
            (103, "unrelated reference text about cooking bread and "
                  "silent winter mornings in a small mountain village"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["ref_id"]): r["jaccard"]
        for r in minhash_lsh_pairs_against(
            docs, ref, threshold=0.5, num_perm=64, bands=32
        ).collect()
    }
    # both same-side dup pairs (1,2) and (102,103) must be absent
    assert all(k[0] in ("1", "2") and k[1] == "101" for k in got)
    assert set(got) == {("1", "101"), ("2", "101")}
    # exact-oracle check: brute-force cross jaccard over shingle hashes
    a = {
        r["doc_id"]: set()
        for r in docs.select("doc_id").collect()
    }
    for r in _shingle_hashes(docs.selectExpr("cast(doc_id as string) doc_id", "text"), 3, 42, True).collect():
        a[int(r["doc_id"])] = a.get(int(r["doc_id"]), set())
        a[int(r["doc_id"])].add(r["h"])
    b = {}
    for r in _shingle_hashes(ref.selectExpr("cast(doc_id as string) doc_id", "text"), 3, 42, True).collect():
        b.setdefault(int(r["doc_id"]), set()).add(r["h"])
    for (d, rf), j in got.items():
        A, B = a[int(d)], b[int(rf)]
        assert abs(j - len(A & B) / len(A | B)) < 1e-9
