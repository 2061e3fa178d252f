"""Sketch-driven join planning: pick the physical strategy BEFORE the
shuffle, from estimates the data never has to shuffle to produce.

Catalyst picks broadcast-vs-shuffle from byte statistics it already
has; what it cannot see up front is KEY OVERLAP — the case where a
large dim joins only a sliver of a 100 TB fact and the right plan is a
runtime-filter prune (operators/filter_join.py, measured 97.7% of fact
rows dropped at 2% selectivity) rather than a full fact shuffle. This
module turns the library's pre-join estimators (operators/join_stats
.estimate_join: two map-side KMV builds, zero data shuffle) into an
actual dispatch:

    joined, decision = plan_equi_join(spark, fact, dim, "fk", "dk")

Decision ladder (each step falls through when its guard fails):

1. ``broadcast`` — dim rows <= ``broadcast_row_limit``: plain
   broadcast-hash join (the F.broadcast hint; Spark enforces its own
   byte cap at execution).
2. ``runtime_filter`` — containment of the FACT side's keys in the dim
   <= ``rf_containment_max`` and the join type allows pruning
   (inner/left_semi): AMQ-prune the fact before the join.
3. ``shuffle`` — everything else: plain join, AQE owns the physical
   choice (incl. skew splitting).

Every strategy returns EXACTLY the plain join's rows (broadcast and
shuffle are the same logical plan; the runtime filter is zero-FN with
false positives discarded by the join itself — pytest-pinned).

Reference scope: no counterpart in TomerEven/Prefix-Filter; this is
the engine-side payoff of the sketch family (SURVEY.md §2.4) — the
"use it to pick a strategy up front" note in join_stats.py made real.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prefix_filter_spark.operators.filter_join import runtime_filter_join
from prefix_filter_spark.operators.join_stats import JoinEstimate, estimate_join
from prefix_filter_spark.sketches import kmv


@dataclass(frozen=True)
class JoinDecision:
    strategy: str          # "broadcast" | "runtime_filter" | "shuffle"
    reason: str
    estimate: JoinEstimate


def plan_equi_join(
    spark: SparkSession,
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    *,
    how: str = "inner",
    broadcast_row_limit: int = 2_000_000,
    rf_containment_max: float = 0.5,
    rf_kind: str = "bloom",
    cfg: kmv.KmvConfig | None = None,
    seed: int = 0x0F11,
) -> tuple[DataFrame, JoinDecision]:
    """-> (joined DataFrame, JoinDecision). See module docstring.

    ``broadcast_row_limit`` is a row-count guard, not a byte guard —
    size it from the dim's schema width (2M rows of a 32-byte dim is
    64 MB, the classic broadcast ceiling); Spark still enforces its
    own byte limit at execution time. ``rf_containment_max``: build
    the runtime filter when at most this share of the fact's distinct
    keys survives the join (the prune removes ~(1 - containment) of
    the fact before its shuffle)."""
    est = estimate_join(fact, fact_key, dim, dim_key, cfg)
    prunable = how in ("inner", "left_semi", "leftsemi")
    if est.rows_b <= broadcast_row_limit:
        out = fact.join(
            F.broadcast(dim), fact[fact_key] == dim[dim_key], how
        )
        dec = JoinDecision(
            "broadcast",
            f"dim rows {est.rows_b} <= {broadcast_row_limit}",
            est,
        )
    elif prunable and est.containment_a <= rf_containment_max:
        out = runtime_filter_join(
            spark,
            fact,
            dim,
            fact_key,
            dim_key,
            kind=rf_kind,
            how=how,
            broadcast_dim=False,
            seed=seed,
        )
        dec = JoinDecision(
            "runtime_filter",
            f"fact-key containment {est.containment_a:.3f} <= "
            f"{rf_containment_max} (est. {1 - est.containment_a:.0%} of "
            "fact rows pruned before the shuffle)",
            est,
        )
    else:
        out = fact.join(dim, fact[fact_key] == dim[dim_key], how)
        dec = JoinDecision(
            "shuffle",
            f"dim rows {est.rows_b} > {broadcast_row_limit} and "
            f"containment {est.containment_a:.3f} > {rf_containment_max}",
            est,
        )
    return out, dec
