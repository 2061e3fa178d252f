"""PII detection/redaction (operators/pii.py)."""

from pyspark.sql import functions as F

from prefix_filter_spark.operators.pii import pii_signals, redact_pii


def _docs(spark):
    rows = [
        (1, "Mail me at Bob.Smith+x@Example.COM today"),
        (2, "server at 10.0.42.7 and backup at 192.168.1.254"),
        (3, "call 555-123-4567 or 555-987-6543 now"),
        (4, "no pii here just words"),
        (5, "combo a@b.io 1.2.3.4 555-000-1111"),
        (6, "not-a-phone 12-34-56 and not-an-ip 1.2.3"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_counts(spark):
    got = {
        r["doc_id"]: (r["n_email"], r["n_ipv4"], r["n_phone"], r["has_pii"])
        for r in pii_signals(_docs(spark)).collect()
    }
    assert got == {
        1: (1, 0, 0, True),
        2: (0, 2, 0, True),
        3: (0, 0, 2, True),
        4: (0, 0, 0, False),
        5: (1, 1, 1, True),
        6: (0, 0, 0, False),
    }


def test_redaction_is_clean(spark):
    """After redaction, the detector must find nothing — the
    placeholders can't re-match and no partial PII survives."""
    red = redact_pii(_docs(spark))
    again = pii_signals(red)
    assert again.where(F.col("has_pii")).count() == 0
    texts = {r["doc_id"]: r["text"] for r in red.collect()}
    assert texts[1] == "Mail me at <EMAIL> today"
    assert texts[5] == "combo <EMAIL> <IP> <PHONE>"
    assert texts[4] == "no pii here just words"


def test_redaction_preserves_case(spark):
    """Redaction must only rewrite PII spans — a clean document comes
    back byte-identical (round-3 regression: lower() destroyed the case
    of every document), and mixed-case PII is still caught via (?i)."""
    rows = [
        (1, "No PII Here: Just CamelCase And UPPERCASE words."),
        (2, "Write USER.Name@EXAMPLE.Com or Admin@Test.ORG please"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    texts = {r["doc_id"]: r["text"] for r in redact_pii(df).collect()}
    assert texts[1] == "No PII Here: Just CamelCase And UPPERCASE words."
    assert texts[2] == "Write <EMAIL> or <EMAIL> please"
    sig = {r["doc_id"]: r["n_email"] for r in pii_signals(df).collect()}
    assert sig == {1: 0, 2: 2}
