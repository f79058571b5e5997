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
    """Real decode hook — wire PIL/soundfile/pyav here when available."""
    raise NotImplementedError(
        "media decode requires image/audio libs not present in this container"
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
