"""Distributed connected components over near-duplicate pairs.

The step every dedup pipeline needs between pair generation
(minhash_lsh_pairs / simhash_pairs / srp_near_dup_pairs /
semdedup_pairs) and the keep-one-per-cluster decision: near-dup PAIRS
are edges; the unit of deduplication is the connected COMPONENT (A~B,
B~C ⇒ {A,B,C} even when A~C never surfaced as a pair).

Algorithm: alternating large-star / small-star (Kiveris et al. 2014,
"Connected Components in MapReduce and Beyond") — the standard
shuffle-based CC for data too big for one machine:

- large-star: every node u connects its strictly-larger neighbors to
  m(u) = min(Γ(u) ∪ {u}).
- small-star: every node u connects its smaller-or-equal neighbors
  (and itself) to m(u).

Each round is two groupBy-min aggregations plus a join — no
collect_list, so a hot node (a giant dup cluster) never materializes
its neighbor list in one task. Converges in O(log² n) rounds to a
star forest: every node points at its component's minimum id.

Determinism: every step is a min — the result is a pure function of
the edge set, independent of partitioning, merge order, or executor
count (property: CC(edges) == CC(shuffle(edges))).

Scale notes: each round's output is checkpointed to truncate the
iterative lineage — ``localCheckpoint`` in local mode, reliable
``checkpoint(dir)`` when ``checkpoint_dir`` is passed (the real-
cluster path: survives executor loss); rounds are counted, and the
loop stops on a fixpoint detected by an order-free edge-set
fingerprint (count + sum of xxhash64) — one tiny aggregate per round
over the just-checkpointed blocks, no driver-side edge
materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Canonical undirected form: (s, b) with s < b, distinct, no loops."""
    return (
        edges.select(
            F.least("u", "v").alias("s"), F.greatest("u", "v").alias("b")
        )
        .where(F.col("s") != F.col("b"))
        .distinct()
    )


def _fingerprint(canon: DataFrame) -> tuple[int, int]:
    row = canon.agg(
        F.count("*").alias("n"),
        # decimal(38,0) sum: exact and ANSI-overflow-free for any count
        F.coalesce(
            F.sum(F.xxhash64("s", "b").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _large_star(canon: DataFrame) -> DataFrame:
    sym = canon.select(F.col("s").alias("u"), F.col("b").alias("v")).union(
        canon.select(F.col("b").alias("u"), F.col("s").alias("v"))
    )
    mins = sym.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )
    return (
        sym.where(F.col("v") > F.col("u"))
        .join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(canon: DataFrame) -> DataFrame:
    # orient every edge toward its larger endpoint b; Γ(b) here is b's
    # smaller neighborhood, so m = min over it (always ≤ b)
    mins = canon.groupBy("b").agg(F.min("s").alias("m"))
    attach = canon.join(mins, "b").select(
        F.col("s").alias("u"), F.col("m").alias("v")
    )
    selfs = mins.select(F.col("b").alias("u"), F.col("m").alias("v"))
    return attach.union(selfs)


def connected_components(
    pairs: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, component) for every node in ``pairs``; component = the
    smallest node id reachable from it. Raises if ``max_iter`` rounds
    (default 25 ≫ the O(log² n) bound for any feasible n) pass without
    a fixpoint — that means a bug, not a big graph.

    ``checkpoint_dir``: on a real cluster pass a (durable, shared) path
    — per-round truncation then uses reliable ``checkpoint`` instead of
    ``localCheckpoint``, so the iteration survives executor loss (a
    localCheckpoint lives in executor block storage; losing one
    executor aborts the lineage-free job). Local mode defaults to the
    cheaper localCheckpoint.

    Round cost (trimmed in round 4): large-star's output is already
    loop-free with every edge oriented big->small, so it feeds
    small-star directly as (s, b) = (m, v) WITHOUT the intermediate
    canon distinct — duplicates are harmless under the min
    aggregations and are removed by the round's single final distinct.
    One shuffle fewer per round; the convergence fingerprint (count +
    order-free hash sum) runs on the checkpointed output, so it costs
    one tiny job over cached blocks."""
    spark = pairs.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _truncate(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    canon = _truncate(
        _canon(pairs.select(F.col(src).alias("u"), F.col(dst).alias("v")))
    )
    prev = _fingerprint(canon)
    for _ in range(max_iter):
        ls = _large_star(canon)  # (u, v) with u > v strictly
        half = ls.select(F.col("v").alias("s"), F.col("u").alias("b"))
        canon = _truncate(_canon(_small_star(half)))
        cur = _fingerprint(canon)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # star forest: every non-root points at its root; roots are the
    # component minima and belong to their own component
    members = canon.select(F.col("b").alias("node"), F.col("s").alias("component"))
    roots = canon.select(F.col("s").alias("node"), F.col("s").alias("component"))
    return members.union(roots).distinct()


def leakage_safe_split(
    pairs: DataFrame,
    all_ids: DataFrame,
    test_frac: float = 0.1,
    id_col: str = "doc_id",
    src: str = "d1",
    dst: str = "d2",
    seed: int = 17,
) -> DataFrame:
    """Train/test split that cannot leak near-duplicates across the
    boundary: the unit of assignment is the CONNECTED COMPONENT of the
    near-dup graph, not the document — if A~B and A lands in test, B
    lands in test too (splitting per-doc puts one twin in train and one
    in test, silently inflating eval scores; this is the standard
    decontamination guard for heldout sets).

    Returns (id_col, component, split) with split ∈ {'train','test'};
    singletons (untouched by any pair) are their own component. The
    assignment hash is LCG arithmetic over the component id (seeded,
    deterministic, DuckDB-mirrorable), so the split is a pure function
    of (edge set, seed) — reshuffling data or adding executors cannot
    move a document across the boundary.
    """
    comp = connected_components(pairs, src=src, dst=dst)
    with_comp = (
        all_ids.select(F.col(id_col).alias("node"))
        .join(comp, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("component", "node").alias("component"),
        )
    )
    # reduce into 31 bits BEFORE the seed addition AND the multiply:
    # component+seed overflows int64 for components within `seed` of
    # 2^63 (review finding), and (x)*A overflows above ~8.4e9. Both
    # pmod-first forms are value-identical in exact arithmetic, so the
    # DuckDB oracle (HUGEINT promotion) and small-id outputs are
    # unchanged.
    h = F.pmod(
        F.pmod(
            F.pmod(F.col("component"), F.lit(2_147_483_648)) + F.lit(seed),
            F.lit(2_147_483_648),
        )
        * F.lit(1103515245)
        + F.lit(12345),
        F.lit(2_147_483_648),
    )
    cut = int(test_frac * 2_147_483_648)
    return with_comp.withColumn(
        "split", F.when(h < F.lit(cut), F.lit("test")).otherwise(F.lit("train"))
    )


def dedup_keep_list(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str = "doc_id",
    src: str = "d1",
    dst: str = "d2",
) -> DataFrame:
    """The pipeline's final answer: every id in ``all_ids`` with its
    component and a ``keep`` flag — keep the component minimum (one
    survivor per dup cluster), keep everything untouched by any pair."""
    comp = connected_components(pairs, src=src, dst=dst)
    return (
        all_ids.select(F.col(id_col).alias("node"))
        .join(comp, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("component", "node").alias("component"),
            (F.col("component").isNull() | (F.col("component") == F.col("node")))
            .alias("keep"),
        )
    )
