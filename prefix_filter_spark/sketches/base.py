"""Shared machinery for sharded, mergeable sketches.

Every sketch in this library is represented as a DataFrame of shard rows:

    (sketch string, shard_id int, state binary,
     n_keys long, input_rows long, build_ns long)

``n_keys``/``input_rows``/``build_ns`` are the per-partition lineage +
metrics required by the north rule (distinct keys retained, raw rows
seen, build wall time). Merging two shard rows with the same shard_id is
associative + commutative (sketch-specific combine); merging rows with
different shard_ids is disjoint union. That makes the whole filter a
mergeable aggregate: build partials anywhere, tree-merge in any order.

Equivalent of the reference's FilterAPI construct/add path
(``/root/reference/Tests/wrappers.hpp:50-52,675-720``) re-expressed as a
grouped vectorized build: one applyInPandas call builds a whole shard
from its key batch instead of 25M single-key Add() calls.
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prefix_filter_spark.hashing import as_u64
from prefix_filter_spark.plans.sharding import hashed_key_col, shard_col, widen_key_col

SHARD_SCHEMA = (
    "sketch string, shard_id int, state binary, "
    "n_keys long, input_rows long, build_ns long"
)

# state_fn(shard_id, unique_sorted_u64_hashes) -> bytes
# (with value_col: state_fn(shard_id, raw_u64_hashes, values) -> bytes)
StateFn = Callable[[int, np.ndarray], bytes]

# proxy table per num_shards: proxies[s] is a long whose Spark Murmur3
# partition assignment pmod(hash(p), num_shards) equals s — see
# _shard_proxies
_PROXY_CACHE: dict[int, list[int]] = {}


def _shard_proxies(spark, num_shards: int) -> list[int]:
    """For each shard id s, a long p with pmod(Murmur3(p), num_shards)
    == s (F.hash IS Spark's HashPartitioning hash, seed 42). Lets
    spread_tasks place each shard in ITS OWN shuffle partition: a plain
    repartition(n, shard_col) re-hashes the shard id, and Murmur3
    collisions leave ~1/e of the partitions empty while the worst task
    serializes several shards' sequential solves (measured: 64 shards
    → 37 occupied partitions, max 4 shards in one task). One tiny
    64*num_shards-row job computes the table; cached per shard count."""
    if num_shards not in _PROXY_CACHE:
        span = 64 * num_shards
        for _ in range(8):  # widen until every residue is covered
            rows = (
                spark.range(0, span)
                .select("id", F.pmod(F.hash("id"), F.lit(num_shards)).alias("s"))
                .groupBy("s")
                .agg(F.min("id").alias("p"))
                .collect()
            )
            m = {int(r["s"]): int(r["p"]) for r in rows}
            if len(m) == num_shards:
                break
            span *= 8
        else:  # pragma: no cover — P(miss) ~ num_shards * e^-64
            raise RuntimeError(f"no proxy found for all {num_shards} shards")
        _PROXY_CACHE[num_shards] = [m[s] for s in range(num_shards)]
    return _PROXY_CACHE[num_shards]


def build_sharded(
    df: DataFrame,
    key_col,
    *,
    sketch_name: str,
    seed: int,
    num_shards: int,
    state_fn: StateFn,
    dedupe: bool = True,
    spread_tasks: bool = False,
    value_col=None,
) -> DataFrame:
    """Hash keys JVM-side, shuffle once by shard, build each shard in one
    vectorized pandas call.

    The only shuffle is the groupBy(shard_id); routing, hashing and
    column pruning all stay in Catalyst. Keys are deduped *inside* the
    shard build (same key always routes to the same shard), avoiding a
    second shuffle for distinct().

    ``spread_tasks=True`` places each shard in ITS OWN shuffle
    partition (and task). The NumPy builds leave it off — AQE's
    coalescing is the right call when the per-shard work is a
    microsecond-scale vector pass over a few hundred KB. The ribbon /
    retrieval solves turn it on: each is SECONDS of sequential Python
    per shard, so any two shards sharing a task double the critical
    path. Mechanism: repartition-and-group on a PROXY expression —
    Murmur3-preimages of the shard ids (_shard_proxies) — because a
    plain repartition(n, shard_col) re-hashes the id and collisions
    leave ~1/e of the partitions empty (measured: 64 shards → 37
    occupied, worst task 4 shards; with proxies 64/64 occupied, max 1).
    Grouping on the same proxy expression keeps it one exchange, and
    the true shard id is recomputed from the hashes inside the build.

    ``value_col`` (optional): ship a long value column through Arrow
    next to the hash; ``state_fn`` then receives (shard_id, raw_hashes,
    values) — unsorted, NOT deduped (kv state_fns own duplicate
    semantics, e.g. the retrieval structure's conflict check). NULL
    values raise (pandas would silently turn them into float NaN →
    INT64_MIN garbage).
    """
    from prefix_filter_spark.hashing import shard_of

    # integral keys hash at bigint width on every path (widen_key_col) —
    # a narrow int column would otherwise take the JVM 4-byte kernel and
    # break the driver-side probe twins' zero-FN contract
    h = hashed_key_col(widen_key_col(df, key_col), seed)
    # group by the shard EXPRESSION: the grouping key is evaluated
    # JVM-side but not shipped through Arrow — the Python worker sees
    # only the 8-byte hash column (33% less pipe volume) and recomputes
    # the shard id with the arithmetic-identical NumPy fastrange.
    if value_col is not None:
        vcol = value_col if not isinstance(value_col, str) else F.col(value_col)
        keyed = df.select(h.alias("h"), vcol.cast("long").alias("v"))
    else:
        keyed = df.select(h.alias("h"))
    group_key = shard_col(F.col("h"), num_shards).alias("shard_id")
    if spread_tasks:
        proxies = _shard_proxies(df.sparkSession, num_shards)
        proxy = F.element_at(
            F.array(*[F.lit(p).cast("long") for p in proxies]),
            shard_col(F.col("h"), num_shards) + F.lit(1),
        )
        keyed = keyed.repartition(num_shards, proxy)
        group_key = proxy.alias("spread_key")

    def build_group(pdf: pd.DataFrame) -> pd.DataFrame:
        t0 = time.perf_counter_ns()
        hashes = as_u64(pdf["h"].to_numpy())
        shard_id = int(shard_of(hashes[:1], num_shards)[0])
        input_rows = len(hashes)
        if value_col is not None:
            if pdf["v"].isnull().any():
                raise ValueError(
                    f"NULL value in {sketch_name} build (shard {shard_id}): "
                    "the value column must be non-null — filter or fill "
                    "upstream"
                )
            values = pdf["v"].to_numpy().astype(np.int64)
            state = state_fn(shard_id, hashes, values)
            n_keys = len(np.unique(hashes))
        else:
            if dedupe:
                hashes = np.unique(hashes)  # sorted + distinct
            else:
                hashes = np.sort(hashes)
            state = state_fn(shard_id, hashes)
            n_keys = len(hashes)
        return pd.DataFrame(
            {
                "sketch": [sketch_name],
                "shard_id": [shard_id],
                "state": [state],
                "n_keys": [n_keys],
                "input_rows": [input_rows],
                "build_ns": [time.perf_counter_ns() - t0],
            }
        )

    return keyed.groupBy(group_key).applyInPandas(build_group, schema=SHARD_SCHEMA)


def merge_shard_states(df: DataFrame, merge_fn) -> DataFrame:
    """Combine same-shard partial states (associative + commutative).

    Used for incremental / streaming builds where several batches each
    produced partial states for the same shard. ``merge_fn`` is either
    ``f(states)`` (Bloom/BBF/HLL/CMS/KLL/t-digest, and two-choice with
    the config curried: ``lambda states: tc.merge_states(states, cfg)``)
    or ``f(states, shard_id)`` (the prefix filter, whose spare re-keying
    depends on the shard id: ``lambda states, sid:
    pf.merge_states(states, cfg, sid)``). The result is
    order-independent by the sketches' associativity (pytest-verified
    by shuffling orders).

    NOTE: this merges rows of the SAME shard id. Do not use tree_merge
    (which coarsens shard ids) for key-sharded filters — that is only
    for global-state sketches where shard_id is mere lineage.
    """
    import inspect

    # dispatch on REQUIRED positional arity only: a default-bound config
    # (lambda states, cfg=cfg: ...) must not be mistaken for shard-aware,
    # and *args wrappers count as shard-aware capable
    params = list(inspect.signature(merge_fn).parameters.values())
    required_positional = sum(
        1
        for p in params
        if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
        and p.default is p.empty
    )
    wants_shard = required_positional >= 2

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        states = [bytes(s) for s in pdf["state"]]
        sid = int(pdf["shard_id"].iloc[0])
        if len(states) > 1:
            merged = merge_fn(states, sid) if wants_shard else merge_fn(states)
        else:
            merged = states[0]
        return pd.DataFrame(
            {
                "sketch": [pdf["sketch"].iloc[0]],
                "shard_id": [int(pdf["shard_id"].iloc[0])],
                "state": [merged],
                "n_keys": [int(pdf["n_keys"].sum())],  # upper bound across batches
                "input_rows": [int(pdf["input_rows"].sum())],
                "build_ns": [int(pdf["build_ns"].sum())],
            }
        )

    return df.groupBy("shard_id").applyInPandas(merge_group, schema=SHARD_SCHEMA)


def remove_keys_sharded(
    df: DataFrame,
    key_col,
    *,
    seed: int,
    num_shards: int,
    shards_df: DataFrame,
    remove_state_fn: Callable[[bytes, np.ndarray], bytes],
    merge_fn: Callable[[list[bytes]], bytes],
    count_state_fn: Callable[[bytes], int] | None = None,
) -> DataFrame:
    """Distributed delete for delete-capable filters (two-choice,
    cuckoo — wrappers.hpp functionality mask 7): route removal keys to
    their shard with the same Catalyst expression as the build, cogroup
    with the shard's state row(s), rebuild without the dead pairs.

    Shards holding several un-compacted partial rows (the streaming
    accumulation shape) are MERGED first — deleting from only one
    partial would silently resurrect the key from the others.
    Shards with no removal keys pass through (post-merge) unchanged.

    ``count_state_fn``: exact occupied-pair recount from a rebuilt
    state. When provided, the emitted ``n_keys`` is recounted from the
    post-merge/post-delete state (both TC and cuckoo count exactly at
    pair granularity); without it, ``n_keys`` stays the sum over
    partials — an upper bound that can overstate materially once the
    merge dedupes overlapping partials and the delete removes pairs.
    """
    h = hashed_key_col(widen_key_col(df, key_col), seed)
    keyed = df.select(h.alias("h"), shard_col(h, num_shards).alias("shard_id"))

    def apply_removals(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(right) == 0:
            return pd.DataFrame(
                columns=["sketch", "shard_id", "state", "n_keys", "input_rows", "build_ns"]
            )
        states = [bytes(s) for s in right["state"]]
        state = merge_fn(states) if len(states) > 1 else states[0]
        if len(left):
            state = remove_state_fn(state, as_u64(left["h"].to_numpy()))
        out = right.iloc[[0]].copy()
        out["state"] = [state]
        if count_state_fn is not None:
            out["n_keys"] = [int(count_state_fn(state))]
        else:
            # pre-delete upper bound (documented caveat)
            out["n_keys"] = [int(right["n_keys"].sum())]
        out["input_rows"] = [int(right["input_rows"].sum())]
        out["build_ns"] = [int(right["build_ns"].sum())]
        return out

    return (
        keyed.groupBy("shard_id")
        .cogroup(shards_df.groupBy("shard_id"))
        .applyInPandas(apply_removals, schema=SHARD_SCHEMA)
    )


def build_partials(
    df: DataFrame,
    value_col,
    *,
    sketch_name: str,
    acc_factory: Callable[[], "Accumulator"],
) -> DataFrame:
    """One partial sketch state per input partition, no shuffle at all.

    For sketches whose state is small and global (HLL registers, CMS
    counters, KLL compactors, t-digest centroids): each partition folds
    its rows into an accumulator (vectorized update per Arrow batch),
    emits one shard row keyed by the Spark partition id (per-partition
    lineage), and ``tree_merge`` combines the partials. This is the
    map-side-combine shape: at 1000 executors the shuffle moves only
    num_partitions tiny states, never the data.
    """
    col = value_col if not isinstance(value_col, str) else F.col(value_col)
    src = df.select(col.alias("v"), F.spark_partition_id().alias("pid"))

    def run(batches):
        acc = acc_factory()
        rows = 0
        pid = -1
        t0 = time.perf_counter_ns()
        for pdf in batches:
            if len(pdf):
                pid = int(pdf["pid"].iloc[0])
                acc.update(pdf["v"].to_numpy())
                rows += len(pdf)
        if rows:
            yield pd.DataFrame(
                {
                    "sketch": [sketch_name],
                    "shard_id": [pid],
                    "state": [acc.to_bytes()],
                    "n_keys": [rows],
                    "input_rows": [rows],
                    "build_ns": [time.perf_counter_ns() - t0],
                }
            )

    return src.mapInPandas(run, schema=SHARD_SCHEMA)


def build_partials_multi(
    df: DataFrame,
    value_cols: dict,
    sketches: dict,
) -> DataFrame:
    """N accumulator sketches from ONE pass over the data — the
    scan-count win of the partials family at 100 TB: the standard
    observability suite (distinct + frequency + heavy hitters +
    quantiles) costs one corpus read instead of one per sketch.

    ``value_cols``: {col_key: Column-or-name} — each value expression
    is evaluated once JVM-side and shipped once through Arrow, shared
    by every sketch bound to it. ``sketches``: {sketch_name: (col_key,
    acc_factory)}. NULL values are skipped per sketch (so one exploded
    row stream can carry a per-ROW value in one column and a per-GROUP
    value materialized only on the group's first row in another —
    NULLs elsewhere). Nullable long columns arrive in pandas as
    float64 + NaN; after dropna they are cast back to int64, exact for
    |v| < 2^53 (every token-id / count column here).

    Output: SHARD_SCHEMA rows, one per (partition, sketch) — the same
    shape ``build_partials`` emits, so ``tree_merge`` and the lineage
    tooling apply unchanged. ``build_ns`` records the partition's
    whole-scan time on each of its rows (the accumulators share the
    pass; per-sketch attribution would be fiction). Callers fanning
    out into per-sketch tree_merges should cache the returned
    DataFrame first — each downstream filter re-scans otherwise.
    """
    sel = []
    for k, col in value_cols.items():
        c = F.col(col) if isinstance(col, str) else col
        sel.append(c.alias(k))
    src = df.select(*sel, F.spark_partition_id().alias("pid"))

    def run(batches):
        accs = {name: fac() for name, (_, fac) in sketches.items()}
        rows = {name: 0 for name in sketches}
        pid = -1
        t0 = time.perf_counter_ns()
        total = 0
        for pdf in batches:
            if not len(pdf):
                continue
            pid = int(pdf["pid"].iloc[0])
            total += len(pdf)
            for name, (key, _) in sketches.items():
                v = pdf[key].dropna()
                if not len(v):
                    continue
                arr = v.to_numpy()
                if arr.dtype.kind == "f":
                    arr = arr.astype(np.int64)
                accs[name].update(arr)
                rows[name] += len(v)
        if total:
            ns = time.perf_counter_ns() - t0
            yield pd.DataFrame(
                {
                    "sketch": list(sketches),
                    "shard_id": [pid] * len(sketches),
                    "state": [accs[n].to_bytes() for n in sketches],
                    "n_keys": [rows[n] for n in sketches],
                    "input_rows": [total] * len(sketches),
                    "build_ns": [ns] * len(sketches),
                }
            )

    return src.mapInPandas(run, schema=SHARD_SCHEMA)


def tree_merge(
    df: DataFrame,
    merge_fn: Callable[[list[bytes]], bytes],
    fanout: int = 32,
    cache_result: bool = False,
) -> DataFrame:
    """Reduce partial states to one row via a fan-in tree of grouped
    merges (the north rule's tree-merge): round r groups shard_id//fanout^r.

    Each round is a tiny shuffle of (num_states / fanout^r) rows; the
    result is independent of grouping because the combines are
    associative + commutative (pytest-verified by shuffling orders).

    The tree is composed LAZILY: one small job reads the max shard id
    off the cached partials (which also materializes them), the round
    count follows arithmetically from that bound, and the whole fan-in
    chain executes inside the caller's single action — round-1's
    cache+count per round cost 2 extra Spark jobs per sketch build
    whose latency dominated small-input builds.

    Tradeoff: because only the PARTIALS are cached, every action on the
    returned DataFrame re-executes the log-fanout merge rounds (cheap —
    they touch num_states/fanout^r rows — but not free). Single-action
    consumers (the common path: collect the merged state once) want the
    default; pass ``cache_result=True`` when the merged result is acted
    on repeatedly (e.g. a diagnostics loop over the same merged state).
    """
    prev = df.cache()
    row = prev.agg(F.max("shard_id").alias("m")).collect()[0]
    if row["m"] is None:
        return prev  # no partials (empty input)
    bound = int(row["m"]) + 1
    while bound > 1:
        prev = merge_shard_states(
            prev.withColumn("shard_id", (F.col("shard_id") / F.lit(fanout)).cast("int")),
            merge_fn,
        )
        bound = -(-bound // fanout)
    return prev.cache() if cache_result else prev


class Accumulator:
    """Interface for build_partials accumulators."""

    def update(self, values: np.ndarray) -> None:  # pragma: no cover
        raise NotImplementedError

    def to_bytes(self) -> bytes:  # pragma: no cover
        raise NotImplementedError


def collect_states(shards_df: DataFrame) -> dict[int, bytes]:
    """Collect shard states to the driver (for broadcast-probe).

    Shard states are sized to stay small (<= ~100MB total, SURVEY.md §4);
    for probe workloads too large to broadcast, join probes to shard rows
    by shard_id instead (see sketches/probe.py).
    """
    rows = shards_df.select("shard_id", "state").collect()
    return {r["shard_id"]: bytes(r["state"]) for r in rows}
