"""End-to-end pipeline composition smoke (tools/pipeline_demo.py):
the library's operator families chained into the canonical prep DAG
must run at sf0.001 with monotone stage attrition and consistent
outputs."""

import sys

sys.path.insert(0, ".")


def test_pipeline_demo_smoke(spark):
    from tools.pipeline_demo import run_pipeline

    s = run_pipeline(spark, "/root/testdata/sf0.001")
    assert s["input_docs"] == 500
    assert (
        s["input_docs"] >= s["after_quality"] >= s["after_dedup"]
        >= s["after_decontam"] >= s["sampled"] > 0
    )
    assert s["packed_docs"] == s["sampled"]
    assert s["n_packs"] >= 1
    assert "en" in s["langs"]
    # stage 8 (map-side df-bucket enrichment): coverage holds by
    # construction, so every token got a bucket and the fraction is a
    # well-defined [0,1] number
    assert s["rare_token_frac"] is not None
    assert 0.0 <= s["rare_token_frac"] <= 1.0
