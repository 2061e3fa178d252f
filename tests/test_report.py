"""dataset_report (operators/report.py): composition of the gated
observability operators into one artifact dict.

Gates: every section present with the right artifact shape and
internally consistent numbers (profile row count == input rows,
drift covers every source, overlap covers every source pair, token
report quantiles ordered); section toggles honored; unknown section
rejected.
"""

import pytest

from prefix_filter_spark.operators.report import dataset_report


@pytest.fixture(scope="module")
def report(documents):
    docs = documents.selectExpr(
        "cast(doc_id as string) doc_id", "text", "source"
    )
    return docs, dataset_report(docs)


def test_all_sections_present(report):
    _, rep = report
    assert set(rep) == {
        "profile", "tokens", "power_laws", "source_drift", "source_overlap"
    }


def test_profile_section(report):
    docs, rep = report
    n = docs.count()
    rows = {r["column"]: r for r in rep["profile"]}
    assert set(rows) == {"doc_id", "source", "text"}
    assert all(r["n_rows"] == n for r in rows.values())
    assert rows["doc_id"]["n_distinct"] == n  # doc_id unique


def test_tokens_section(report):
    _, rep = report
    states, tok = rep["tokens"]
    assert {"hll", "kmv", "cms", "mg", "kll", "tdigest"} <= set(states)
    qs = tok["n_tok_quantiles_kll"]
    vals = [qs[q] for q in sorted(qs)]
    assert vals == sorted(vals)  # quantiles monotone
    assert tok["distinct_tokens_hll"] > 0


def test_power_laws_section(report):
    _, rep = report
    pl = rep["power_laws"]
    assert pl["n_tokens"] > 0 and pl["vocab_size"] > 0
    assert pl["zipf_slope"] < 0  # frequency falls with rank


def test_drift_and_overlap_cover_sources(report):
    docs, rep = report
    sources = {r["source"] for r in docs.select("source").distinct().collect()}
    assert {r["source"] for r in rep["source_drift"]} == sources
    ov = rep["source_overlap"]
    n = len(sources)
    assert len(ov) == n * (n - 1) // 2


def test_section_toggle_and_validation(report):
    docs, _ = report
    partial = dataset_report(docs, sections=("profile",))
    assert set(partial) == {"profile"}
    with pytest.raises(ValueError, match="unknown report sections"):
        dataset_report(docs, sections=("profile", "nope"))
