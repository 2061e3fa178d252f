"""Line-level boilerplate removal (operators/boilerplate.py): planted
template lines, strategy equivalence, all-dropped documents, and the
map-only plan pin for the literal path."""

import pytest
from pyspark.sql import functions as F

from prefix_filter_spark.operators import boilerplate as bp


@pytest.fixture(scope="module")
def toy_docs(spark):
    mk = "\n".join
    rows = [
        (0, mk(["cookie banner", "real content zero", "footer menu"])),
        (1, mk(["cookie banner", "unique text one", "footer menu"])),
        (2, mk(["cookie banner", "  real content zero  ", "closing line"])),
        (3, mk(["cookie banner", "footer menu"])),  # all boilerplate
        (4, mk(["", "only unique here", " "])),  # empties dropped pre-count
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_boilerplate_dropped_uniques_kept(spark, toy_docs):
    # cookie banner: 4 docs; footer menu: 3; real content zero: 2 (one
    # via trim); everything else: 1 doc
    rep = {
        r["line"]: r["n_docs"]
        for r in bp.boilerplate_report(toy_docs, min_docs=3).collect()
    }
    assert rep == {"cookie banner": 4, "footer menu": 3}

    out = {
        r["doc_id"]: (r["text"], r["n_lines_kept"], r["n_lines_dropped"])
        for r in bp.drop_boilerplate_lines(toy_docs, min_docs=3).collect()
    }
    assert out[0] == ("real content zero", 1, 2)
    assert out[1] == ("unique text one", 1, 2)
    # trim-normalized match: doc 2's padded "real content zero" copy
    # survives (freq 2 < 3); original order preserved
    assert out[2] == ("real content zero\nclosing line", 2, 1)
    # all lines boilerplate -> row kept with empty text, not dropped
    assert out[3] == ("", 0, 2)
    # empty/whitespace lines never count as lines at all
    assert out[4] == ("only unique here", 1, 0)


def test_trim_normalization_counts_padded_copies(spark, toy_docs):
    # at min_docs=2 the trim-matched "real content zero" IS boilerplate
    out = {
        r["doc_id"]: r["text"]
        for r in bp.drop_boilerplate_lines(toy_docs, min_docs=2).collect()
    }
    assert out[0] == "" and out[2] == "closing line"


def test_strategies_bit_identical(spark, documents):
    docs = documents.withColumn(
        "text", F.replace(F.col("text"), F.lit(" the "), F.lit("\n"))
    ).withColumn("text", F.replace(F.col("text"), F.lit(" a "), F.lit("\n")))
    lit = bp.drop_boilerplate_lines(docs, min_docs=3, strategy="literal")
    join = bp.drop_boilerplate_lines(docs, min_docs=3, strategy="join")
    cols = ["doc_id", "text", "n_lines_kept", "n_lines_dropped"]
    assert sorted(map(tuple, lit.select(cols).collect())) == sorted(
        map(tuple, join.select(cols).collect())
    )
    # and the report is non-trivial on this derivation (drops happen)
    assert lit.where(F.col("n_lines_dropped") > 0).count() > 0


def test_literal_path_plan_is_map_only(spark, toy_docs):
    out = bp.drop_boilerplate_lines(toy_docs, min_docs=3, strategy="literal")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_literal_overflow_raises(spark, toy_docs):
    with pytest.raises(ValueError, match="max_literal_lines"):
        bp.drop_boilerplate_lines(
            toy_docs, min_docs=2, strategy="literal", max_literal_lines=1
        )


def test_auto_falls_back_to_join(spark, toy_docs):
    # cap of 1 forces the join path; output must match the literal path
    auto = bp.drop_boilerplate_lines(
        toy_docs, min_docs=3, strategy="auto", max_literal_lines=1
    )
    lit = bp.drop_boilerplate_lines(toy_docs, min_docs=3, strategy="literal")
    cols = ["doc_id", "text", "n_lines_kept", "n_lines_dropped"]
    assert sorted(map(tuple, auto.select(cols).collect())) == sorted(
        map(tuple, lit.select(cols).collect())
    )


def test_gate_matches_duckdb(spark):
    """The driver-gate twin: q_boilerplate_lines vs its oracle SQL."""
    import duckdb

    import __spark_entry__ as entry
    from tests.conftest import SF_DIR as sf_dir

    got = entry.q_boilerplate_lines(spark, sf_dir).collect()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = con.execute(entry.oracle_sql()["boilerplate_lines"]).fetchall()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
