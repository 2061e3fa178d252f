"""End-to-end corpus curation — the canonical web-pipeline funnel
(C4, Raffel et al. 2020; RefinedWeb, Penedo et al. 2023; FineWeb)
composed from the library's own operators, in the order those
pipelines run them:

    1. language filter        (lang allow-list — map-only)
    2. quality filter         (text.quality_exprs threshold — map-only)
    3. PII redaction          (pii.redact_pii — map-only)
    4. boilerplate removal    (boilerplate.drop_boilerplate_lines)
    5. exact dedup            (dedup.exact_duplicates keep-first)
    6. near dedup             (dedup.minhash_lsh_pairs →
                               components.connected_components →
                               keep the min doc_id per duplicate
                               cluster — the keep-list rule every
                               published pipeline uses)
    7. decontamination        (decontaminate.contaminated_docs
                               anti-join vs a benchmark table)

Each stage is individually oracle-gated elsewhere (driver CORRECTNESS
rows / pytest gates named in SURVEY.md §2.7); this module adds the
COMPOSITION: one call, stages toggled by config, schema preserved
end-to-end (every stage returns the full document row), plus a funnel
report of rows in/out per stage — the audit artifact a data-curation
run has to ship with.

Scale shape: stages 1-3 are map-only and fuse into a single scan
(Catalyst collapses consecutive projections/filters — zero exchanges
until stage 4). Stages 4-7 each pay exactly the shuffle budget their
operator documents in SCALE.md (boilerplate: line-count agg + doc
rebuild; exact dedup: one fingerprint shuffle + anti-join; near dedup:
the one-corpus-shuffle LSH plan + vocab-small CC rounds over the PAIR
set only; decontamination: map-side AMQ prune, survivors-only verify).
The funnel report is opt-in (``audit=True``): counting forces one
extra evaluation per stage boundary, which is fine at test scale and a
deliberate choice at 100 TB (run audit-off for the production pass and
derive counts from sink metrics, or accept ~2× scan cost for the
audited run — documented, not hidden).

Determinism: every stage is a pure function of (input rows, config,
seed) — the whole funnel is partition-invariant and replayable
(pytest: planted-document funnel, double-run equality, repartition
equality).

Reference scope note: the reference repo (TomerEven/Prefix-Filter) has
no text pipeline; this is the brief-mandated training-data family's
integration layer over operators/{text,pii,boilerplate,dedup,
components,decontaminate}.py.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CurationConfig:
    """Stage toggles + thresholds. ``None`` disables a stage."""

    keep_langs: tuple[str, ...] | None = None
    min_quality: float | None = None
    redact_pii: bool = True
    boilerplate_min_docs: int | None = None
    exact_dedup: bool = True
    near_dup_threshold: float | None = 0.8
    minhash_num_perm: int = 128
    minhash_bands: int = 32
    shingle_n: int = 3
    decontaminate_n: int = 3
    decontaminate_min_hits: int = 1
    seed: int = 42


def _keep_min_per_component(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Drop every duplicate-cluster member except the smallest doc_id.

    Non-members of any pair never enter the component computation (the
    CC input is the PAIR set, not the corpus), so the join back is
    against a table bounded by the number of near-duplicate docs."""
    from prefix_filter_spark.operators.components import connected_components

    comp = connected_components(pairs, "d1", "d2")
    drop = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    return docs.join(drop, "doc_id", "left_anti")


def curate_corpus(
    docs: DataFrame,
    config: CurationConfig = CurationConfig(),
    benchmark: DataFrame | None = None,
    audit: bool = False,
) -> tuple[DataFrame, list[tuple[str, int, int]]]:
    """Run the funnel; returns (curated_docs, report).

    ``report`` is [(stage, rows_in, rows_out), ...] when ``audit=True``
    (one count per stage boundary), else []. Input must carry
    ``doc_id`` and ``text``; stages 1 requires ``lang``. Output schema
    == input schema (stages only drop rows or rewrite ``text``)."""
    from prefix_filter_spark.operators.boilerplate import (
        drop_boilerplate_lines,
    )
    from prefix_filter_spark.operators.dedup import (
        exact_duplicates,
        minhash_lsh_pairs,
    )
    from prefix_filter_spark.operators.decontaminate import contaminated_docs
    from prefix_filter_spark.operators.pii import redact_pii
    from prefix_filter_spark.operators.text import quality_exprs

    cols = docs.columns
    report: list[tuple[str, int, int]] = []
    cur = docs

    def step(name: str, out: DataFrame) -> DataFrame:
        nonlocal cur
        if audit:
            report.append((name, cur.count(), out.count()))
        cur = out
        return out

    if config.keep_langs is not None:
        step("lang_filter", cur.where(F.col("lang").isin(*config.keep_langs)))
    if config.min_quality is not None:
        q = quality_exprs("text")["quality"]
        step("quality_filter", cur.where(q >= F.lit(config.min_quality)))
    if config.redact_pii:
        # row-preserving rewrite: report it with rows_in == rows_out so
        # the funnel stays a complete stage log
        step("pii_redact", redact_pii(cur, "text"))
    if config.boilerplate_min_docs is not None:
        cleaned = drop_boilerplate_lines(
            cur, "text", min_docs=config.boilerplate_min_docs
        ).select(*cols)
        step("boilerplate", cleaned)
    if config.exact_dedup:
        dup_drop = (
            exact_duplicates(cur)
            .select(
                F.explode("members").alias("doc_id"),
                F.col("keep_doc_id"),
            )
            .where(F.col("doc_id") != F.col("keep_doc_id"))
            .select("doc_id")
        )
        step("exact_dedup", cur.join(dup_drop, "doc_id", "left_anti"))
    if config.near_dup_threshold is not None:
        pairs = minhash_lsh_pairs(
            cur,
            threshold=config.near_dup_threshold,
            num_perm=config.minhash_num_perm,
            bands=config.minhash_bands,
            n=config.shingle_n,
            seed=config.seed,
        ).select("d1", "d2")
        step("near_dedup", _keep_min_per_component(cur, pairs))
    if benchmark is not None:
        bad = contaminated_docs(
            docs.sparkSession,
            cur,
            benchmark,
            n=config.decontaminate_n,
            min_hits=config.decontaminate_min_hits,
        ).select("doc_id")
        step("decontaminate", cur.join(bad, "doc_id", "left_anti"))
    return cur, report
