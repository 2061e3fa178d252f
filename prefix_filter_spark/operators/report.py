"""One-call dataset report — ANALYZE TABLE for a training corpus.

Composes the library's own gated observability operators into the
single artifact a dataset card needs, each section the cheapest shape
the library offers:

- ``profile``: per-column rows/nulls/distinct/min/max
  (``operators/profile.table_profile``; ``exact=False`` swaps all
  countDistincts for HLL++ at corpus scale — one scan either way);
- ``tokens``: the six-sketch one-scan token suite (distinct tokens,
  frequencies, heavy hitters, n_tok quantiles —
  ``operators/profile.token_sketch_profile``), states returned so a
  later snapshot can MERGE rather than rescan;
- ``power_laws``: Zipf slope + Heaps exponent with fit R²
  (``operators/corpus_stats.corpus_power_laws``);
- ``source_drift``: per-source KL vs the corpus mixture, most-drifted
  first (``operators/drift.source_drift``);
- ``source_overlap``: pairwise shingle-Jaccard mirror matrix
  (``operators/overlap.source_overlap_matrix``).

Scan budget: sections are independent single-scan jobs (2 scans for
power_laws' checkpointed vocab) — the report costs a handful of corpus
reads total and returns ONLY driver-sized artifacts (rows per column /
source / source-pair, fitted scalars, sketch states). Sections toggle
off for partial reports; every component keeps its own gate, so this
wrapper adds composition, not new math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from prefix_filter_spark.operators.corpus_stats import corpus_power_laws
from prefix_filter_spark.operators.drift import source_drift
from prefix_filter_spark.operators.overlap import source_overlap_matrix
from prefix_filter_spark.operators.profile import (
    table_profile,
    token_sketch_profile,
)
from prefix_filter_spark.sources.tokenizer import tokenize_documents


def dataset_report(
    docs: DataFrame,
    *,
    text_col: str = "text",
    group_col: str = "source",
    exact_profile: bool = True,
    sections: tuple = (
        "profile",
        "tokens",
        "power_laws",
        "source_drift",
        "source_overlap",
    ),
) -> dict:
    """-> {section: artifact} for the requested sections.

    Artifacts: ``profile`` list[Row]; ``tokens`` (states dict, report
    dict); ``power_laws`` dict of fitted scalars; ``source_drift``
    list[Row] (most-drifted first); ``source_overlap`` pandas frame
    (most-overlapping pair first). ``exact_profile=False`` is the
    corpus-scale switch (HLL++ distinct counts).
    """
    known = {"profile", "tokens", "power_laws", "source_drift", "source_overlap"}
    bad = set(sections) - known
    if bad:
        raise ValueError(f"unknown report sections: {sorted(bad)}")
    out: dict = {}
    if "profile" in sections:
        cols = [c for c in docs.columns if c != text_col] + [text_col]
        out["profile"] = table_profile(docs, cols, exact=exact_profile).collect()
    if "tokens" in sections:
        seqs = tokenize_documents(docs)
        out["tokens"] = token_sketch_profile(seqs)
    if "power_laws" in sections:
        out["power_laws"] = corpus_power_laws(docs, text_col=text_col)
    if "source_drift" in sections:
        out["source_drift"] = source_drift(
            docs, text_col=text_col, group_col=group_col
        ).collect()
    if "source_overlap" in sections:
        out["source_overlap"] = source_overlap_matrix(
            docs, group_col=group_col, text_col=text_col
        )
    return out
