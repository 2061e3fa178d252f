"""Pre-join cardinality estimation from KMV sketches.

Answering "how big is this join?" BEFORE shuffling 100 TB: two
map-side KMV sketch builds (one tiny tree-merge each, no data
shuffle — sketches/kmv.py) yield distinct-key counts for both sides,
their overlap, and containment, with published error bounds. The row
estimate adds the uniform-frequency assumption (rows/distinct per
side), the same first-order model cost-based optimizers start from —
exact for key-to-key joins (multiplicity 1), documented bias when
per-key multiplicity correlates with key overlap.

Use it to pick a strategy up front: broadcast (tiny distinct dim),
bucketed write (repeated joins on the same key), or a runtime-filter
prune (low containment — see operators/filter_join.py, whose
measured win was 97.7%% of fact rows dropped at 2%% selectivity).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from prefix_filter_spark.sketches import kmv


@dataclass(frozen=True)
class JoinEstimate:
    distinct_a: float
    distinct_b: float
    overlap: float        # |keys(A) ∩ keys(B)| estimate
    containment_a: float  # share of A's distinct keys that survive the join
    containment_b: float
    rows_a: int
    rows_b: int
    est_join_rows: float  # overlap * (rows_a/distinct_a) * (rows_b/distinct_b)
    rel_error: float      # ~1/sqrt(k-2) per sketch; overlap error grows
    #                       with union/intersection (kmv.py docstring)


def estimate_join(
    dfa: DataFrame,
    key_a,
    dfb: DataFrame,
    key_b,
    cfg: kmv.KmvConfig | None = None,
) -> JoinEstimate:
    """Two sketch builds + driver-side set expressions; the data never
    shuffles and never joins. ``key_a``/``key_b`` are hash columns or
    column names — both sides MUST hash with the same seed family
    (pass the raw key column; hashing happens inside the sketch)."""
    cfg = cfg or kmv.KmvConfig()
    rows_a = dfa.count()
    rows_b = dfb.count()
    sa = kmv.sketch_bytes(dfa.select(key_a), dfa.select(key_a).columns[0], cfg)
    sb = kmv.sketch_bytes(dfb.select(key_b), dfb.select(key_b).columns[0], cfg)
    da = max(kmv.estimate(sa), 1.0)
    db = max(kmv.estimate(sb), 1.0)
    ov = kmv.intersection_estimate(sa, sb)
    return JoinEstimate(
        distinct_a=da,
        distinct_b=db,
        overlap=ov,
        containment_a=ov / da,
        containment_b=ov / db,
        rows_a=rows_a,
        rows_b=rows_b,
        est_join_rows=ov * (rows_a / da) * (rows_b / db),
        rel_error=cfg.rel_error(),
    )
