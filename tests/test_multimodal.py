import numpy as np
import pytest

from prefix_filter_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synthetic_media(spark, 200, seed=5).cache()


def test_schema_and_determinism(spark, media):
    a = media.toPandas()
    b = mm.synthetic_media(spark, 200, seed=5).toPandas()
    assert a["payload"].map(bytes).tolist() == b["payload"].map(bytes).tolist()
    assert set(a["kind"]) == {"image", "audio"}


def test_extract_features_shapes(media):
    out = mm.extract_features(media).toPandas()
    assert len(out) == 200
    assert out["ok"].all()
    assert out["feature"].map(len).eq(64).all()
    # deterministic features
    out2 = mm.extract_features(media).toPandas()
    f1 = np.vstack(out.sort_values("media_id")["feature"].to_numpy())
    f2 = np.vstack(out2.sort_values("media_id")["feature"].to_numpy())
    assert np.array_equal(f1, f2)


def test_strict_backend_marks_rows_not_failing(media):
    out = mm.extract_features(media, backend=mm.DecodeBackend(strict=True)).toPandas()
    assert len(out) == 200 and (~out["ok"]).all()


def test_resize_images(media):
    out = mm.resize_images(media, 8, 6).toPandas()
    assert (out["width"] == 8).all() and (out["height"] == 6).all()
    assert out["thumb"].map(len).eq(8 * 6 * 3).all()


def test_sample_frames_plan_is_catalyst_only(media):
    plan = mm.sample_frames(media, every_ms=100)
    rows = plan.groupBy("media_id").count().toPandas()
    meta = media.select("media_id", "meta.duration_ms").toPandas()
    j = rows.merge(meta, on="media_id")
    expect = (j["duration_ms"] + 99) // 100
    assert (j["count"] == expect).all()
    # no Python UDF in the plan
    assert "Python" not in plan._jdf.queryExecution().executedPlan().toString()
