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


# ---------------- real codecs (stdlib wave + NumPy BMP/netpbm) ----------
def test_wav_bmp_codec_roundtrip():
    rng = np.random.default_rng(11)
    wav = rng.uniform(-0.9, 0.9, 1600).astype(np.float32)
    got = mm.decode_wav(mm.encode_wav(wav, 16_000))
    assert got.shape == wav.shape
    assert np.abs(got - wav).max() < 1.0 / 32000  # 16-bit PCM quantization
    img = rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
    assert np.array_equal(mm.decode_bmp(mm.encode_bmp(img)), img)
    # netpbm P6
    p6 = b"P6\n# comment\n32 24\n255\n" + img.tobytes()
    assert np.array_equal(mm.decode_pnm(p6), img)


def test_real_codec_backend_through_pipeline(spark):
    """Real RIFF/WAVE + BMP payloads flow through the distributed
    mapInPandas extract with PcmCodecBackend and decode exactly —
    the codec seam exercised with genuine container formats."""
    rng = np.random.default_rng(13)
    rows = []
    imgs, wavs = {}, {}
    for i in range(8):
        if i % 2 == 0:
            img = rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
            imgs[f"r-{i}"] = img
            rows.append((f"r-{i}", "image", bytearray(mm.encode_bmp(img)),
                         (32, 24, 3, 16_000, 100, "bmp")))
        else:
            wav = rng.uniform(-0.9, 0.9, 1600).astype(np.float32)
            wavs[f"r-{i}"] = wav
            rows.append((f"r-{i}", "audio", bytearray(mm.encode_wav(wav)),
                         (32, 24, 3, 16_000, 100, "wav")))
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in mm.extract_features(
        media, backend=mm.PcmCodecBackend(strict=True)).collect()}
    assert len(out) == 8 and all(r["ok"] for r in out.values())
    backend = mm.PcmCodecBackend(strict=True)
    for mid, img in imgs.items():
        want = mm.row_feature(
            backend, "image", mm.encode_bmp(img),
            {"width": 32, "height": 24, "channels": 3},
        )
        assert np.array_equal(np.array(out[mid]["feature"], dtype=np.float32), want)
    for mid, wav in wavs.items():
        want = mm.row_feature(
            backend, "audio", mm.encode_wav(wav),
            {"sample_rate": 16_000, "duration_ms": 100},
        )
        assert np.array_equal(np.array(out[mid]["feature"], dtype=np.float32), want)
    # strict backend + non-container payload = poison pill, not job death
    junk = spark.createDataFrame(
        [("bad", "image", bytearray(b"\x00junk"), (32, 24, 3, 16_000, 100, "?"))],
        mm.MEDIA_SCHEMA,
    )
    bad = mm.extract_features(junk, backend=mm.PcmCodecBackend(strict=True)).collect()
    assert len(bad) == 1 and not bad[0]["ok"]


def test_resize_real_bmp(spark):
    """resize over a real BMP: nearest-neighbor thumbnail matches the
    driver-side computation on the decoded pixels."""
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
    media = spark.createDataFrame(
        [("b-0", "image", bytearray(mm.encode_bmp(img)), (32, 24, 3, 0, 0, "bmp"))],
        mm.MEDIA_SCHEMA,
    )
    row = mm.resize_images(media, 8, 6, backend=mm.PcmCodecBackend(strict=True)).collect()[0]
    ys = (np.arange(6) * 24 // 6).astype(int)
    xs = (np.arange(8) * 32 // 8).astype(int)
    want = img[ys][:, xs]
    got = np.frombuffer(bytes(row["thumb"]), dtype=np.uint8).reshape(6, 8, 3)
    assert np.array_equal(got, want)
