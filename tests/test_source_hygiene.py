"""Anti-pattern lint over the library source, pytest-enforced.

These are the slow-path patterns the 100TB design bans (SURVEY.md §7,
VERDICT r01 'anti-pattern scan'): row-at-a-time pandas iteration,
row-at-a-time Python UDFs, and the RDD API. Keeping the scan in the
suite stops regressions from reintroducing them silently.
"""

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "prefix_filter_spark"


def _sources():
    return sorted(PKG.rglob("*.py"))


def test_no_iterrows():
    """pandas .iterrows() constructs a Series per row (~10x iteration
    cost vs zipped columns) — banned everywhere in the package."""
    bad = [
        p.name
        for p in _sources()
        if re.search(r"\.iterrows\(", p.read_text())
    ]
    assert not bad, f"iterrows found in {bad}"


def test_no_row_at_a_time_udf():
    """Only Arrow-batched pandas UDFs are allowed (F.pandas_udf /
    mapInPandas / applyInPandas) — never row-at-a-time F.udf."""
    # flags F.udf( / functions.udf( / bare udf( definitions, but not
    # pandas_udf, attribute calls of stored UDF objects (self.udf(...)),
    # spark.udf.register, or this package's *_udf helper names
    pat = re.compile(r"(?:\bF\.|\bfunctions\.|(?<![\w.]))udf\s*\(")
    bad = []
    for p in _sources():
        hits = [
            ln
            for ln in p.read_text().splitlines()
            if pat.search(ln)
            and "pandas_udf" not in ln
            and "spark.udf.register" not in ln
            and "_udf(" not in ln
            and not ln.strip().startswith("#")
        ]
        if hits:
            bad.append((p.name, hits))
    assert not bad, f"row-at-a-time udf found: {bad}"


def test_no_rdd_api():
    """Declarative DataFrame plans only — the RDD API bypasses Catalyst
    (no pushdown, no AQE, no codegen)."""
    bad = [
        p.name
        for p in _sources()
        if re.search(r"\.rdd\b|sparkContext\.parallelize", p.read_text())
    ]
    assert not bad, f"RDD API found in {bad}"


def test_no_toPandas_in_operators():
    """Full-DataFrame driver collects don't belong on operator data
    paths; the two training helpers that legitimately reduce partial
    state to the driver are allowlisted and must stay the only ones."""
    allow = {"text.py"}  # train_lang_centroids: L x 4096 partial sums
    bad = [
        p.name
        for p in _sources()
        if p.name not in allow and ".toPandas()" in p.read_text()
    ]
    assert not bad, f"driver-side toPandas in {bad}"
