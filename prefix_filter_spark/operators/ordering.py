"""Deterministic epoch ordering — reproducible per-epoch data shuffling
for training pipelines: every epoch must see the corpus in a different
pseudo-random order, and re-running epoch k must reproduce exactly the
same order (resumable training, bit-exact re-runs, debuggable loss
spikes). Brief-mandated family (no reference counterpart).

Order key: a seeded LCG mix of (id, epoch) — multiply/add/mod
arithmetic that Spark and DuckDB evaluate identically (the same trick
as operators/sampling.py), so the gate is an exact hash-match. Swap in
``xxhash64(id, epoch)`` at scale for better mixing (one expression; the
LCG keeps the oracle cross-engine).

Two shapes:
- ``epoch_order``: one global rank via a window over the whole corpus.
  Exact, but a global row_number is a SINGLE-PARTITION sort at 100 TB —
  gate/test scale only (the docstring cliff every engine shares).
- ``epoch_shards``: the scale path — shard = hash mod num_shards, rank
  within shard; readers consume shards in any order, each shard
  internally shuffled. One hash repartition + per-shard sort, fully
  parallel, and the (shard, rank) pair is still a deterministic pure
  function of (id, epoch, num_shards).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2_147_483_648  # 2^31
_EPOCH_MIX = 2_654_435_761  # Knuth multiplicative constant


def epoch_hash(id_col: Column, epoch: int) -> Column:
    """Deterministic per-epoch order key in [0, 2^31) — pure integer
    arithmetic, identical in Spark and DuckDB.

    The id is reduced into 31 bits BEFORE the multiply: ``x*A`` would
    overflow LongType for ids above ~8.4e9 (throws under the session's
    ANSI default, silently wraps otherwise) — exactly the 64-bit hashed
    doc-id scale this targets. ``pmod(x, M)*A + C`` peaks at ~2.4e18,
    inside int64, and ``(x mod M)*A + C mod M == x*A + C mod M`` in
    exact arithmetic, so small-id outputs (and the DuckDB oracle, which
    promotes to HUGEINT) are unchanged."""
    # pmod the id BEFORE the epoch-mix addition too: id + lit(mix)
    # itself overflows int64 for ids within `mix` of 2^63 (review
    # finding; reachable with xxhash64-derived ids). Value-identical:
    # (id mod M + k) mod M == (id + k) mod M.
    mixed = F.pmod(id_col, F.lit(_LCG_M)) + F.lit(
        int(epoch) * _EPOCH_MIX % _LCG_M
    )
    reduced = F.pmod(mixed, F.lit(_LCG_M))
    return F.pmod(reduced * F.lit(_LCG_A) + F.lit(_LCG_C), F.lit(_LCG_M))


def epoch_order(
    docs: DataFrame, epoch: int, id_col: str = "doc_id"
) -> DataFrame:
    """(…, epoch_rank) — the global 1-based position of each row in
    epoch ``epoch``'s order. Test/gate scale only (global window)."""
    h = epoch_hash(F.col(id_col), epoch)
    w = Window.orderBy(h, F.col(id_col))
    return docs.withColumn("epoch_rank", F.row_number().over(w))


def epoch_shards(
    docs: DataFrame,
    epoch: int,
    num_shards: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """(…, shard, shard_rank) — the scale path: readers stream shard
    files in any order; within a shard, rows come in the epoch's
    pseudo-random order. Plan: one hash shuffle + parallel per-shard
    windows (never a global sort)."""
    h = epoch_hash(F.col(id_col), epoch)
    out = docs.withColumn("shard", F.pmod(h, F.lit(num_shards)))
    w = Window.partitionBy("shard").orderBy(h, F.col(id_col))
    return out.withColumn("shard_rank", F.row_number().over(w))
