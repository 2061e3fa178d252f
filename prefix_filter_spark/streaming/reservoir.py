"""Streaming weighted reservoir sampling: maintain an exactly-k,
weight-proportional-without-replacement sample of an UNBOUNDED stream
with O(k) state per group.

This is the streaming twin of
``operators/sampling.weighted_sample_without_replacement`` and shares
its Efraimidis-Spirakis key (``sampling.es_key``, computed as the same
Catalyst expression BEFORE the stateful operator): a row's key is
ln(U)/w with a deterministic per-row uniform, and the reservoir is
simply the k largest keys seen so far. Top-k of a fixed key set is
associative and batch-boundary-free, so the stream's final reservoir
equals the batch sampler over the same rows BIT-FOR-BIT (pytest-
pinned), regardless of how the stream was chopped into triggers —
the same stream==batch contract as streaming/build.py.

State per group: the current reservoir (k keys + k ids + a seen
counter) — fixed size forever, the reservoir-sampling point. Each
trigger emits the group's current reservoir tagged with ``n_seen``;
an append sink therefore holds snapshot HISTORY, and the live sample
is the rows carrying the group's max ``n_seen`` (one filter —
documented in the test). Per-batch work is vectorized NumPy over the
Arrow batch (argpartition top-k), no per-row Python.

Reference scope note: no reference counterpart (the C++ library has
no streaming); extends the training-pipeline family (SURVEY §2.7).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from prefix_filter_spark.operators.sampling import es_key


def streaming_weighted_reservoir(
    stream: DataFrame,
    k: int,
    weight_col: Column,
    id_col: str,
    *,
    strata_col: str | None = None,
    seed: int = 0,
) -> DataFrame:
    """(stratum, doc_id, es_key, n_seen) — the current per-stratum
    reservoir after each trigger. ``strata_col=None`` keeps ONE global
    reservoir; its state is still k rows, but every arriving row then
    routes through a single state task — at high rates use per-stratum
    reservoirs (the usual `source` layout) and merge the per-stratum
    top-k lists downstream when a single global sample is needed
    (top-k merge is associative, so that merge is exact).
    Zero/negative-weight rows are rejected rows, exactly like the
    batch sampler."""
    if k <= 0:
        raise ValueError("k must be positive")
    grp = F.col(strata_col) if strata_col is not None else F.lit("__all__")
    # the id keeps its NATIVE type end to end: tie-breaking on es_key
    # collisions must compare ids with the same semantics as the batch
    # sampler's orderBy(id_col) — a string cast would order integer ids
    # lexically and break the stream==batch contract exactly on ties
    # (review finding)
    id_dt = stream.schema[id_col].dataType.simpleString()
    keyed = stream.where(weight_col > 0).select(
        grp.cast("string").alias("stratum"),
        F.col(id_col).alias("doc_id"),
        es_key(weight_col, id_col, seed).alias("_key"),
    )

    def update(key, pdfs, state: GroupState):
        if state.exists:
            keys, ids, n_seen = state.get
            keys = list(keys)
            ids = list(ids)
        else:
            keys, ids, n_seen = [], [], 0
        for pdf in pdfs:
            n_seen += len(pdf)
            cand_k = np.concatenate([np.asarray(keys, dtype=np.float64), pdf["_key"].to_numpy(np.float64)])
            cand_i = np.concatenate([np.asarray(ids, dtype=object), pdf["doc_id"].to_numpy(object)])
            if len(cand_k) > k:
                # top-k by (key desc, id asc): lexsort on (id, -key)
                order = np.lexsort((cand_i, -cand_k))[:k]
                cand_k, cand_i = cand_k[order], cand_i[order]
            # plain Python scalars: GroupState pickles through the JVM,
            # which rejects numpy scalar types (type itself preserved)
            keys = [float(x) for x in cand_k]
            ids = [x.item() if isinstance(x, np.generic) else x for x in cand_i]
        state.update((keys, ids, int(n_seen)))
        yield pd.DataFrame(
            {
                "stratum": key[0],
                "doc_id": ids,
                "es_key": keys,
                "n_seen": n_seen,
            }
        )

    return keyed.groupBy("stratum").applyInPandasWithState(
        update,
        outputStructType=f"stratum string, doc_id {id_dt}, es_key double, n_seen long",
        stateStructType=f"keys array<double>, ids array<{id_dt}>, n_seen long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
