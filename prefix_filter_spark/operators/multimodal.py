"""Multimodal column plumbing: image/audio/video as opaque binary
columns + typed metadata, with decode / feature-extract / resize /
frame-sample as Arrow-batched mapInPandas operators.

The image/audio codec libraries are NOT in this container (driver
brief), so the codec step is stubbed: ``DecodeBackend`` either raises
NotImplementedError (``strict=True``) or produces a deterministic fake
decode keyed by the payload hash. Everything Spark-side — schema,
partition sizing, UDF signatures, Arrow batch shapes, metadata
propagation — is real and tested; swapping in a real backend is a
one-function change.

Scale note: binary payloads make rows wide; operators here avoid any
shuffle (mapInPandas over the scan) and push column pruning by
selecting only (id, media, meta) before the UDF. At 100TB the inputs
would be Iceberg/parquet with payloads in separate blobs — the operator
shape is unchanged.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta struct<width:int, height:int, channels:int, sample_rate:int, "
    "duration_ms:int, codec:string>"
)


@dataclass
class DecodeBackend:
    """Codec seam. strict=True raises (no codec libs in this image);
    strict=False yields a deterministic fake decode so the pipeline
    shape is testable end-to-end."""

    strict: bool = False
    seed: int = 42

    def decode_image(self, payload: bytes, width: int, height: int, channels: int) -> np.ndarray:
        if self.strict:
            raise NotImplementedError("image codec not available in this environment")
        from prefix_filter_spark.hashing import mix_with_seed

        n = width * height * channels
        base = np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64)
        px = mix_with_seed(
            np.arange(n, dtype=np.uint64) ^ base, self.seed
        ) & np.uint64(0xFF)
        return px.astype(np.uint8).reshape(height, width, channels)

    def decode_audio(self, payload: bytes, sample_rate: int, duration_ms: int) -> np.ndarray:
        if self.strict:
            raise NotImplementedError("audio codec not available in this environment")
        from prefix_filter_spark.hashing import mix_with_seed

        n = max(1, sample_rate * duration_ms // 1000)
        base = np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64)
        s = mix_with_seed(np.arange(n, dtype=np.uint64) ^ base, self.seed)
        return ((s & np.uint64(0xFFFF)).astype(np.float32) / 32768.0) - 1.0


class PcmCodecBackend(DecodeBackend):
    """Real codec backend for the container formats decodable with the
    stdlib + NumPy alone (no external codec libraries exist in this
    image): RIFF/WAVE PCM audio via the ``wave`` module, and
    uncompressed BMP / binary netpbm (P5/P6) images. Payloads in any
    other format fall back to the base DecodeBackend (strict raise or
    deterministic fake), so mixed corpora keep per-row poison-pill
    isolation. Swapping in a full decoder (PIL/soundfile) remains the
    same one-class change — this proves the seam with real containers.
    """

    def decode_image(self, payload: bytes, width: int, height: int, channels: int) -> np.ndarray:
        if payload[:2] == b"BM":
            return decode_bmp(payload)
        if payload[:2] in (b"P5", b"P6"):
            return decode_pnm(payload)
        return super().decode_image(payload, width, height, channels)

    def decode_audio(self, payload: bytes, sample_rate: int, duration_ms: int) -> np.ndarray:
        if payload[:4] == b"RIFF":
            return decode_wav(payload)
        return super().decode_audio(payload, sample_rate, duration_ms)


def decode_wav(payload: bytes) -> np.ndarray:
    """RIFF/WAVE PCM -> float32 mono waveform in [-1, 1)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        nch, sw, _rate, nframes = (
            w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes()
        )
        raw = w.readframes(nframes)
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width {sw}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP -> (H, W, 3) uint8 RGB."""
    import struct as _s

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = _s.unpack_from("<I", payload, 10)[0]
    w, h = _s.unpack_from("<ii", payload, 18)
    bpp = _s.unpack_from("<H", payload, 28)[0]
    comp = _s.unpack_from("<I", payload, 30)[0]
    if comp != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    flip = h > 0  # positive height = bottom-up row order
    h = abs(h)
    nb = bpp // 8
    stride = (w * nb + 3) // 4 * 4
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=data_off)
    img = rows.reshape(h, stride)[:, : w * nb].reshape(h, w, nb)
    if flip:
        img = img[::-1]
    return img[:, :, 2::-1].copy()  # BGR(A) -> RGB


def decode_pnm(payload: bytes) -> np.ndarray:
    """Binary netpbm: P6 -> (H, W, 3) RGB, P5 -> (H, W, 1) gray."""
    parts = []
    pos = 2
    while len(parts) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        end = pos
        while end < len(payload) and not payload[end : end + 1].isspace():
            end += 1
        parts.append(int(payload[pos:end]))
        pos = end
    pos += 1  # single whitespace after maxval
    w, h, maxval = parts
    if maxval > 255:
        raise ValueError("16-bit netpbm unsupported")
    ch = 3 if payload[:2] == b"P6" else 1
    px = np.frombuffer(payload, dtype=np.uint8, count=h * w * ch, offset=pos)
    return px.reshape(h, w, ch).copy()


def encode_wav(waveform: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """float waveform in [-1, 1] -> 16-bit PCM RIFF/WAVE bytes (the
    fixture/sink half of the codec seam; also what resize/re-encode
    stages emit)."""
    import io
    import wave

    x = np.clip(np.asarray(waveform, dtype=np.float64), -1.0, 1.0 - 1.0 / 32768)
    pcm = (x * 32768.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> uncompressed 24-bit BMP bytes."""
    import struct as _s

    h, w, _ = img.shape
    stride = (w * 3 + 3) // 4 * 4
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = body.tobytes()
    header = _s.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54) + _s.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + data


def synthetic_media(spark, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic media table: payload = xxhash64-derived bytes."""
    return spark.range(n_rows).select(
        F.format_string("m-%08d", "id").alias("media_id"),
        F.when(F.pmod("id", F.lit(2)) == 0, "image").otherwise("audio").alias("kind"),
        F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256)
        .cast("binary")
        .alias("payload"),
        F.struct(
            F.lit(32).alias("width"),
            F.lit(24).alias("height"),
            F.lit(3).alias("channels"),
            F.lit(16_000).alias("sample_rate"),
            (F.pmod("id", F.lit(900)) + 100).cast("int").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )


def extract_features(
    media: DataFrame, backend: DecodeBackend | None = None, feat_dim: int = 64
) -> DataFrame:
    """media -> (media_id, kind, feature array<float>, ok boolean).

    Image: decode -> g x g luminance pooling -> flatten, zero-padded to
    feat_dim (g = floor(sqrt(feat_dim)); every row's feature has the
    SAME length so the column vstacks downstream).
    Audio: decode -> feat_dim-bin energy histogram.
    One mapInPandas pass, no shuffle; ANY per-row error -> ok=false
    rather than task failure (poison-pill isolation for 100TB runs —
    a single corrupt meta must not kill the job on deterministic retry).
    """
    backend = backend or DecodeBackend()
    grid = max(1, int(math.isqrt(feat_dim)))

    def run(batches):
        for pdf in batches:
            feats: list = []
            oks: list = []
            # zipped-column iteration, not iterrows: the decode is
            # inherently per-row but the batch walk must not pay
            # pandas Series-construction per row (~10x iteration cost)
            for kind, payload, m in zip(pdf["kind"], pdf["payload"], pdf["meta"]):
                try:
                    feats.append(row_feature(backend, kind, payload, m, feat_dim, grid))
                    oks.append(True)
                except Exception:  # noqa: BLE001 — per-row poison pill
                    feats.append(np.zeros(feat_dim, dtype=np.float32))
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": [f.tolist() for f in feats],
                    "ok": oks,
                }
            )

    return media.select("media_id", "kind", "payload", "meta").mapInPandas(
        run, schema="media_id string, kind string, feature array<float>, ok boolean"
    )


def row_feature(
    backend: DecodeBackend,
    kind: str,
    payload: bytes,
    meta,
    feat_dim: int = 64,
    grid: int | None = None,
) -> np.ndarray:
    """Deterministic feature for one media row — the single code path
    shared by the distributed extract_features UDF and driver-side
    recomputation checks (so the gate verifies the Spark plumbing:
    Arrow transport, batching, schema, ordering)."""
    if grid is None:
        grid = max(1, int(math.isqrt(feat_dim)))
    if kind == "image":
        img = backend.decode_image(
            payload, meta["width"], meta["height"], meta["channels"]
        )
        lum = img.astype(np.float32).mean(axis=2)
        h, w = lum.shape
        g = min(grid, h, w)
        pooled = lum[: h - h % g, : w - w % g].reshape(
            g, (h - h % g) // g, g, (w - w % g) // g
        ).mean(axis=(1, 3))
        vec = np.zeros(feat_dim, dtype=np.float32)
        flat = pooled.ravel().astype(np.float32)[:feat_dim]
        vec[: len(flat)] = flat
        return vec
    wave = backend.decode_audio(payload, meta["sample_rate"], meta["duration_ms"])
    hist, _ = np.histogram(wave, bins=feat_dim, range=(-1, 1))
    return (hist / max(1, len(wave))).astype(np.float32)


def resize_images(media: DataFrame, out_w: int, out_h: int, backend: DecodeBackend | None = None) -> DataFrame:
    """image rows -> re-encoded (here: raw) thumbnails with updated meta."""
    backend = backend or DecodeBackend()

    def run(batches):
        for pdf in batches:
            outs = []
            for payload, m in zip(pdf["payload"], pdf["meta"]):
                img = backend.decode_image(
                    payload, m["width"], m["height"], m["channels"]
                )
                ys = (np.arange(out_h) * img.shape[0] // out_h).astype(int)
                xs = (np.arange(out_w) * img.shape[1] // out_w).astype(int)
                thumb = img[ys][:, xs]
                outs.append(thumb.tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "thumb": outs,
                    "width": out_w,
                    "height": out_h,
                }
            )

    return (
        media.where(F.col("kind") == "image")
        .select("media_id", "payload", "meta")
        .withColumn("kind", F.lit("image"))
        .mapInPandas(run, schema="media_id string, thumb binary, width int, height int")
    )


def sample_frames(media: DataFrame, every_ms: int = 100) -> DataFrame:
    """video/audio frame sampling plan: explode (media_id, frame_ts_ms)
    WITHOUT decoding — pure Catalyst (sequence + explode), the cheap
    pre-pass that decides which frames a decode stage touches.

    Only time-based kinds with a positive duration qualify: images (and
    zero/negative durations, which would make sequence() throw on its
    descending bounds) are filtered out, not crashed on."""
    return (
        media.where(
            F.col("kind").isin("video", "audio")
            & (F.col("meta.duration_ms") > 0)
        )
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("meta.duration_ms") - 1, F.lit(every_ms)
                )
            ).alias("frame_ts_ms"),
        )
    )
