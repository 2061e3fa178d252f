"""PII detection and redaction — the scrubbing pass every
training-data pipeline runs before packing (emails, IPv4 addresses,
phone-shaped numbers). Brief-mandated family (no reference
counterpart; the reference is an AMQ filter library).

Pure Catalyst: regexp_count / regexp_replace over the ORIGINAL text
(case-insensitive via the inline ``(?i)`` flag, which Java regex and
RE2 both support) — map-only, zero shuffles, whole-stage-codegen'd,
and exactly reproducible in DuckDB for the oracle because every
pattern below is written in the common subset of Java regex (Spark)
and RE2 (DuckDB): character classes, bounded repeats, ASCII word
boundaries, inline flags — no lookahead, no backreferences.

Redaction never lowercases: rewriting the text column must only
replace PII spans, not destroy the case of every clean document
(training text corruption). The round-3 implementation lowercased
first; fixed in round 4.

At 100 TB this is a scan-speed pass: detection adds three integer
columns, redaction rewrites the text column in place; neither moves a
byte between executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Java-regex / RE2 common-subset patterns (keep in sync with the
# DuckDB oracle in __spark_entry__.py)
EMAIL_RE = r"(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"

_KINDS = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def pii_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc PII counts + has_pii flag: (doc_id, n_email, n_ipv4,
    n_phone, has_pii). Counts run on the original text with
    case-insensitive patterns, so they agree with what redact_pii
    rewrites."""
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{kind}")
        for kind, pat, _ in _KINDS
    ]
    out = docs.select("doc_id", *counts)
    total = sum(F.col(f"n_{kind}") for kind, _, _ in _KINDS)
    return out.withColumn("has_pii", total > F.lit(0))


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace every PII match with a typed placeholder, all other
    columns untouched. Redaction order is email → ipv4 → phone (an
    email's host can contain digit runs, so emails go first; the
    placeholders themselves contain no digits or '@', so later passes
    can't re-match earlier rewrites). Case-preserving: only matched
    PII spans are rewritten, every other byte is untouched."""
    expr = F.col(text_col)
    for _, pat, token in _KINDS:
        expr = F.regexp_replace(expr, pat, token)
    return docs.withColumn(text_col, expr)
