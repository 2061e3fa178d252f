"""Line-level boilerplate removal: drop lines that repeat across many
documents (menus, footers, cookie banners, error pages).

The C4 pipeline (Raffel et al. 2020, "Exploring the Limits of Transfer
Learning", section 2.2) and RefinedWeb / Dolma after it filter web text
LINE by line before any document-level dedup: a line that appears in
many distinct documents is template chrome, not content. This module is
the distributed form of that rule — no reference counterpart (the
reference is a filter library, /root/reference/Tests/wrappers.hpp; this
operator family is brief-mandated), but the APPLY step deliberately
reuses the repo's broadcast-set idiom from the AMQ probe path.

Shape at 100 TB
---------------
Two jobs:

1. **Count** — explode documents into trimmed non-empty lines, count
   DISTINCT documents per line, keep lines with ``n_docs >= min_docs``.
   One logical aggregation (Spark plans count-distinct as two exchanges
   over (line, doc_id) then (line) — both partial-agg'd map-side). The
   frequent set is SMALL by construction: at threshold t it has at most
   total_lines / t members, and boilerplate thresholds are large
   (RefinedWeb: lines repeated in >= 1/1000 of a crawl), so collecting
   it to the driver is bounded the same way the IVF training sample is.

2. **Apply** — two strategies, picked by frequent-set size:

   * ``literal`` (default when the set fits ``max_literal_lines``):
     embed the frequent lines as an array literal and filter each
     document's line array with a higher-order function — split,
     ``F.filter``, ``array_join`` — entirely inside whole-stage
     codegen. The document side has ZERO exchanges and zero Python
     (plan-pinned in test_boilerplate.py): the 100 TB fact never
     shuffles, exactly the map_enrich.py philosophy.
   * ``join`` (arbitrarily large sets): posexplode lines, left-anti
     broadcast join against the frequent set, reassemble with one
     shuffle on doc_id (sort_array over (pos, line) structs keeps the
     original order). Chosen automatically when the literal would bloat
     the plan; also selectable explicitly.

   Both strategies return bit-identical output (pytest-pinned).

Determinism: the result is a pure function of (documents, min_docs,
line_sep) — no hashing, no floats — so the driver gate hash-matches a
DuckDB mirror directly on the cleaned text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "doc_lines",
    "boilerplate_report",
    "drop_boilerplate_lines",
]


def _lines_col(text_col: Column | str, line_sep: str) -> Column:
    """text -> array of trimmed, non-empty lines (order preserved).

    Mirror (DuckDB): list_filter(list_transform(string_split(text, sep),
    l -> trim(l)), l -> l <> '').
    """
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    # split on the literal separator: regex-escape via char-class when
    # the separator is a single char, else rely on \Q..\E quoting
    pat = "\\Q" + line_sep + "\\E"
    arr = F.split(col, pat, -1)
    trimmed = F.transform(arr, lambda l: F.trim(l))
    return F.filter(trimmed, lambda l: l != F.lit(""))


def doc_lines(
    docs: DataFrame, text_col: str = "text", line_sep: str = "\n"
) -> DataFrame:
    """Exploded (doc_id, pos, line) — trimmed non-empty lines, ``pos``
    is the 0-based index among the KEPT (non-empty) lines."""
    return docs.select(
        "doc_id", F.posexplode(_lines_col(text_col, line_sep)).alias("pos", "line")
    )


def boilerplate_report(
    docs: DataFrame,
    text_col: str = "text",
    line_sep: str = "\n",
    min_docs: int = 100,
) -> DataFrame:
    """Lines appearing in >= min_docs distinct documents, with their
    document frequency — the review artifact (what WOULD be dropped)."""
    lines = doc_lines(docs, text_col, line_sep)
    return (
        lines.groupBy("line")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def drop_boilerplate_lines(
    docs: DataFrame,
    text_col: str = "text",
    line_sep: str = "\n",
    min_docs: int = 100,
    strategy: str = "auto",
    max_literal_lines: int = 4096,
) -> DataFrame:
    """Remove every line that occurs in >= ``min_docs`` distinct
    documents; rebuild ``text_col`` from the surviving lines in their
    original order and append ``n_lines_kept`` / ``n_lines_dropped``.

    ``strategy``: ``"literal"`` (map-only HOF filter, frequent set
    embedded as an array literal), ``"join"`` (posexplode + broadcast
    anti-join + one doc_id shuffle), or ``"auto"`` (literal when the
    frequent set fits ``max_literal_lines``, else join). Output is
    identical either way; documents whose every line was boilerplate
    come back with empty text, not dropped rows (the caller decides —
    a later length filter is the usual next stage).
    """
    if strategy not in ("auto", "literal", "join"):
        raise ValueError(f"unknown strategy {strategy!r}")
    spark = docs.sparkSession
    freq = boilerplate_report(docs, text_col, line_sep, min_docs).select("line")

    frequent: list[str] | None = None
    if strategy in ("auto", "literal"):
        # head(max+1): bounded collect — never pulls an unexpectedly
        # huge frequent set onto the driver just to discover it is big
        head = [r["line"] for r in freq.head(max_literal_lines + 1)]
        if len(head) <= max_literal_lines:
            frequent = head
        elif strategy == "literal":
            raise ValueError(
                f"frequent-line set exceeds max_literal_lines="
                f"{max_literal_lines}; use strategy='join'"
            )

    lines = _lines_col(text_col, line_sep)
    if frequent is not None:
        # ---- map-only path: zero exchanges on the document side ----
        lit_set = F.array(*[F.lit(l) for l in sorted(frequent)])
        kept = F.filter(lines, lambda l: ~F.array_contains(lit_set, l))
        return (
            docs.withColumn("_kept", kept)
            .withColumn(
                "n_lines_dropped",
                (F.size(lines) - F.size("_kept")).cast("long"),
            )
            .withColumn("n_lines_kept", F.size("_kept").cast("long"))
            .withColumn(text_col, F.array_join("_kept", line_sep))
            .drop("_kept")
        )

    # ---- join path: arbitrarily large frequent sets ----
    exploded = docs.select(
        "doc_id", F.posexplode(lines).alias("pos", "line")
    )
    survivors = exploded.join(F.broadcast(freq), "line", "left_anti")
    rebuilt = survivors.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            line_sep,
        ).alias("_new_text"),
        F.count("*").alias("n_lines_kept"),
    )
    totals = exploded.groupBy("doc_id").agg(F.count("*").alias("_n_lines"))
    out_cols = docs.columns
    return (
        docs.drop(text_col)
        .join(totals, "doc_id", "left")
        .join(rebuilt, "doc_id", "left")
        .withColumn(text_col, F.coalesce("_new_text", F.lit("")))
        .withColumn("n_lines_kept", F.coalesce("n_lines_kept", F.lit(0)).cast("long"))
        .withColumn(
            "n_lines_dropped",
            (F.coalesce("_n_lines", F.lit(0)) - F.col("n_lines_kept")).cast("long"),
        )
        .select(*out_cols, "n_lines_kept", "n_lines_dropped")
    )
