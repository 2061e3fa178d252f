"""Deterministic epoch ordering (operators/ordering.py)."""

from pyspark.sql import functions as F

from prefix_filter_spark.operators.ordering import epoch_order, epoch_shards


def _docs(spark, n=300):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_is_a_permutation_and_deterministic(spark):
    docs = _docs(spark)
    a = {r["doc_id"]: r["epoch_rank"] for r in epoch_order(docs, 3).collect()}
    b = {r["doc_id"]: r["epoch_rank"] for r in epoch_order(docs, 3).collect()}
    assert a == b, "same epoch must reproduce the same order"
    assert sorted(a.values()) == list(range(1, 301)), "ranks form a permutation"


def test_epochs_differ(spark):
    docs = _docs(spark)
    e0 = {r["doc_id"]: r["epoch_rank"] for r in epoch_order(docs, 0).collect()}
    e1 = {r["doc_id"]: r["epoch_rank"] for r in epoch_order(docs, 1).collect()}
    moved = sum(1 for k in e0 if e0[k] != e1[k])
    assert moved > 250, f"epochs should reorder most rows, moved={moved}"
    # and neither epoch preserves the trivial id order
    id_order = sum(1 for k in e0 if e0[k] == k + 1)
    assert id_order < 30


def test_sharded_matches_global_within_shard(spark):
    """shard_rank order within a shard == the global epoch order
    restricted to that shard (same key, so the scale path loses no
    determinism)."""
    docs = _docs(spark)
    g = epoch_order(docs, 2).collect()
    s = epoch_shards(docs, 2, num_shards=8).collect()
    shard_of = {r["doc_id"]: r["shard"] for r in s}
    rank_of = {r["doc_id"]: r["shard_rank"] for r in s}
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for r in g:
        sh = shard_of[r["doc_id"]]
        by_shard.setdefault(sh, []).append((r["epoch_rank"], r["doc_id"]))
    for sh, rows in by_shard.items():
        rows.sort()
        for i, (_, doc) in enumerate(rows, start=1):
            assert rank_of[doc] == i, (sh, doc)


def test_repartition_invariance(spark):
    docs = _docs(spark)
    a = {(r["doc_id"], r["shard"], r["shard_rank"])
         for r in epoch_shards(docs, 1, 8).collect()}
    b = {(r["doc_id"], r["shard"], r["shard_rank"])
         for r in epoch_shards(docs.repartition(11), 1, 8).collect()}
    assert a == b


def test_epoch_hash_survives_64bit_ids(spark):
    """Round-3 regression: (id * A) overflowed int64 for ids above
    ~8.4e9 (ANSI throw). The pmod-first form must (a) run on huge ids
    and (b) keep small-id outputs identical to the direct formula."""
    from pyspark.sql import functions as F

    from prefix_filter_spark.operators.ordering import epoch_hash

    big = (
        [(2**62 + i,) for i in range(30)]
        + [(2**63 - 1 - i,) for i in range(30)]  # the epoch-mix-add window
        + [(i,) for i in range(30)]
    )
    df = spark.createDataFrame(big, "doc_id long")
    out = df.select("doc_id", epoch_hash(F.col("doc_id"), 3).alias("h")).collect()
    assert len(out) == 90
    M, A, C, MIX = 2**31, 1103515245, 12345, 2654435761
    add = 3 * MIX % M
    for r in out:
        assert r["h"] == ((r["doc_id"] + add) * A + C) % M  # exact Python ref
