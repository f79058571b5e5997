"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video are ``binary`` columns with a metadata struct. The Spark
side — schema, partitioning, Arrow batch shape, UDF signatures — is real and
tested; the actual codec step is STUBBED (the container has no image/audio
libraries): ``decode_stub`` derives deterministic fake features from the
bytes so the pipeline is end-to-end testable, and ``decode_real`` raises
NotImplementedError where a PIL/ffmpeg call would slot in.

At 100TB: payloads must NOT travel through shuffles — all feature extraction
runs ``mapInPandas`` straight off the scan (one Arrow pass), and only the
small feature vectors continue downstream. ``maxRecordsPerBatch`` bounds
executor memory against multi-MB payload rows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, payload binary, mime string, width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id string, mime string, n_bytes long, feature array<float>"


def decode_real(payload: bytes, mime: str) -> np.ndarray:
    """Real decode: BMP and WAV are parsed by the pure-Python/numpy decoders
    below (no external codec needed — both formats are headers + raw
    samples), so at least one image and one audio format exercise the
    non-stub path end-to-end. Compressed formats (png/jpeg/mp4/...) go
    through PIL when it is installed; otherwise they stay an honest
    NotImplementedError (this container ships no codec libraries)."""
    if mime in ("image/bmp", "image/x-bmp", "image/x-ms-bmp"):
        return _bmp_features(payload)
    if mime in ("audio/wav", "audio/x-wav", "audio/wave"):
        return _wav_features(payload)
    if mime.startswith("image/"):
        try:
            import io

            from PIL import Image  # optional, absent in this container
        except ImportError as e:
            raise NotImplementedError(
                f"decoding {mime} requires Pillow, not present here"
            ) from e
        img = np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"), dtype=np.float32)
        return _pixel_features(img.shape[1], img.shape[0], img)
    raise NotImplementedError(
        f"media decode for {mime} requires codec libs not present in this container"
    )


def _pixel_features(w: int, h: int, rgb: "np.ndarray") -> np.ndarray:
    """[w, h, mean R/G/B, std R/G/B] — exact, codec-independent reduction."""
    flat = rgb.reshape(-1, 3).astype(np.float64)
    return np.concatenate(
        [[float(w), float(h)], flat.mean(axis=0), flat.std(axis=0)]
    ).astype(np.float32)


def _bmp_features(payload: bytes) -> np.ndarray:
    """Uncompressed BI_RGB 24/32-bit BMP (BITMAPFILEHEADER + BITMAPINFOHEADER,
    4-byte-padded bottom-up rows; negative height = top-down). Pure numpy."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pixel_offset,) = struct.unpack_from("<I", payload, 10)
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    _planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP: compression={compression} bpp={bpp}")
    top_down, h = h_signed < 0, abs(h_signed)
    nchan = bpp // 8
    stride = (w * nchan + 3) & ~3
    rows = [
        np.frombuffer(payload, np.uint8, count=w * nchan, offset=pixel_offset + r * stride)
        .reshape(w, nchan)[:, :3]
        for r in range(h)
    ]
    px = np.stack(rows) if top_down else np.stack(rows)[::-1]
    rgb = px[..., ::-1].astype(np.float32)  # stored BGR(A) -> RGB
    return _pixel_features(w, h, rgb)


def _wav_features(payload: bytes) -> np.ndarray:
    """RIFF/WAVE PCM (8/16-bit): [channels, sample_rate, frames, mean, rms,
    peak] over the channel-averaged normalized signal. Pure numpy."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, rate, _byte_rate, _align, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(f"unsupported WAV: format={audio_format} bits={bits}")
    if bits == 16:
        sig = np.frombuffer(data, "<i2").astype(np.float64) / 32768.0
    else:
        sig = (np.frombuffer(data, np.uint8).astype(np.float64) - 128.0) / 128.0
    frames = sig.reshape(-1, channels).mean(axis=1)
    return np.array(
        [
            float(channels),
            float(rate),
            float(len(frames)),
            frames.mean() if len(frames) else 0.0,
            float(np.sqrt((frames**2).mean())) if len(frames) else 0.0,
            float(np.abs(frames).max()) if len(frames) else 0.0,
        ],
        dtype=np.float32,
    )


def decode_stub(payload: bytes, mime: str, dim: int = 16) -> np.ndarray:
    """Deterministic fake 'embedding': sha256-seeded floats in [-1, 1]."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / 2**31 - 1.0).astype(np.float32)


def extract_features(
    df: DataFrame,
    dim: int = 16,
    use_stub: bool = True,
    min_partitions: int | None = None,
) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas (Arrow batches;
    payloads never shuffle — the transform runs straight off the scan, where a
    real media table already has file splits, and the output carries only
    small vectors). Batch memory is bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch.

    ``min_partitions`` is an opt-in for tiny in-memory fixtures that would
    otherwise run single-partition; it inserts a round-robin Exchange that
    DOES move the payload column, so never set it on a real scan."""
    decode = decode_stub if use_stub else decode_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats = [
                decode(bytes(p), m, dim) if use_stub else decode(bytes(p), m)
                for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": feats,
                }
            )

    if min_partitions:
        df = df.repartition(min_partitions)
    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_media(
    df: DataFrame,
    target_w: int,
    target_h: int,
    use_stub: bool = True,
    min_partitions: int | None = None,
) -> DataFrame:
    """Image resize plumbing: mapInPandas over binary payloads producing the
    resized payload + updated dims. The decode/resample step is STUBBED (no
    image libs in this container): the stub emits a deterministic payload of
    ``target_w*target_h`` bytes derived from sha256(payload) so downstream
    schema/partitioning/batch shape are real and testable; ``use_stub=False``
    raises where the PIL resize would slot in. Payload rows never shuffle —
    the transform runs straight off the scan."""
    out_schema = (
        "media_id string, mime string, width int, height int, payload binary"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = target_w * target_h
        for pdf in batches:
            if not len(pdf):
                continue
            if not use_stub:
                raise NotImplementedError(
                    "real resize requires an image library not present here"
                )
            payloads = [
                bytes(
                    (hashlib.sha256(bytes(p)).digest() * (n // 32 + 1))[:n]
                )
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "width": target_w,
                    "height": target_h,
                    "payload": payloads,
                }
            )

    if min_partitions:
        df = df.repartition(min_partitions)
    return df.mapInPandas(run, schema=out_schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands (media_id, duration_ms) into one
    row per sampled timestamp — pure JVM explode; the per-frame decode would
    ride the same mapInPandas slot as extract_features."""
    return df.select(
        "media_id",
        "mime",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def synthetic_media(spark, n_rows: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    import random

    rng = random.Random(seed)
    mimes = ["image/png", "image/jpeg", "audio/wav", "video/mp4"]
    rows = []
    for i in range(n_rows):
        payload = bytes(rng.randrange(256) for _ in range(64 + i % 128))
        m = mimes[i % len(mimes)]
        rows.append(
            (f"m{i:05d}", payload, m, 64 + i % 512, 48 + i % 256, 1000 * (1 + i % 30))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
