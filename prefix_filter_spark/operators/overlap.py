"""Pairwise content overlap between sources — the mirror detector.

Curation question: which of a corpus's sources are near-copies of each
other (mirrors, scrapes of the same site, re-crawls)? Doc-level dedup
answers per document; this answers per SOURCE, and must not cost a
pairwise corpus join. One corpus pass builds a KMV/theta sketch of
each source's k-gram shingle set (skew-safe salted per-group build,
``operators/per_group.py``); every pairwise Jaccard / intersection /
distinct estimate then comes from the collected states — G sketches of
k u64 each, so the G² pair arithmetic is driver-side NumPy over a few
MB and the corpus is never touched again. Error ~ 1/sqrt(k) per
estimate (``sketches/kmv.py`` bounds, gate-tested against exact).

Scale: G = source count (10s-10^4) — states total G*k*8 bytes (160 MB
at G=10^4, k=2048), pairs G². Past ~10^4 sources, prune pairs first
(e.g. bucket by the sketches' minimum values — same LSH idea, one more
pass); documented seam, not needed at any realistic source count.

Reference scope note: the reference repo (TomerEven/Prefix-Filter) has
no multi-set analytics; this extends the engine's KMV set-expression
family (SURVEY.md §2.4) to the pairwise-matrix shape.
"""

from __future__ import annotations

from itertools import combinations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prefix_filter_spark.operators.per_group import sketch_by_group
from prefix_filter_spark.sketches import kmv
from prefix_filter_spark.sources.tokenizer import words_col


def source_shingles(
    docs: DataFrame,
    *,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 5,
    seed: int = 0x0B31,
) -> DataFrame:
    """(group, g): every word k-gram of every doc, hashed to 64 bits
    JVM-side — the value stream the per-source sketches fold. Same
    word normalization as every text operator."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    wsd = docs.select(
        F.col(group_col).alias("group"), words_col(text_col).alias("_ws")
    )
    ws = F.col("_ws")
    grams = F.when(
        F.size(ws) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - k),
            lambda i: F.xxhash64(
                F.concat_ws(" ", F.slice(ws, i + 1, k)), F.lit(seed)
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return wsd.select("group", F.explode(grams).alias("g"))


def source_overlap_matrix(
    docs: DataFrame,
    *,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 5,
    cfg: kmv.KmvConfig | None = None,
    salt_buckets: int = 16,
    seed: int = 0x0B31,
) -> pd.DataFrame:
    """All source pairs with estimated shingle-set overlap.

    -> pandas DataFrame (a, b, jaccard, n_common, n_union, n_a, n_b)
    sorted by jaccard descending, one row per unordered pair — small
    by construction (G² rows), so it comes back driver-side like every
    collected report in the library. Estimates carry the KMV bounds;
    a mirror pair reads jaccard ~= 1, disjoint sources ~= 0.
    """
    cfg = cfg or kmv.KmvConfig(k=2048, seed=42)
    shingles = source_shingles(
        docs, group_col=group_col, text_col=text_col, k=k, seed=seed
    )
    states_df = sketch_by_group(
        shingles,
        "group",
        "g",
        acc_factory=lambda: kmv.KmvAccumulator(cfg),
        merge_fn=kmv.merge_states,
        salt_on="g",
        salt_buckets=salt_buckets,
    )
    states = {
        r["group"]: bytes(r["state"]) for r in states_df.collect()
    }
    rows = []
    for a, b in combinations(sorted(states), 2):
        sa, sb = states[a], states[b]
        rows.append(
            {
                "a": a,
                "b": b,
                "jaccard": kmv.jaccard_estimate(sa, sb),
                "n_common": kmv.intersection_estimate(sa, sb),
                "n_union": kmv.union_estimate(sa, sb),
                "n_a": kmv.estimate(sa),
                "n_b": kmv.estimate(sb),
            }
        )
    out = pd.DataFrame(
        rows, columns=["a", "b", "jaccard", "n_common", "n_union", "n_a", "n_b"]
    )
    return out.sort_values(
        ["jaccard", "a", "b"], ascending=[False, True, True], ignore_index=True
    )
