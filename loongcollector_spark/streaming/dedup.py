"""Streaming exact dedup — the training-pipeline twin of functions.dedup.

A live ingestion stream re-delivers documents (at-least-once sources,
repeated crawls); exact dedup on a stream cannot hold all history, so state
is bounded by a WATERMARK: duplicates arriving within ``delay`` of the
original are dropped, older re-deliveries pass through (and are caught by
the batch dedup downstream). This is Spark's
``withWatermark + dropDuplicatesWithinWatermark`` — state per key is evicted
once the watermark passes, so executor memory is bounded by (arrival rate ×
delay), not corpus size.

Keying on a content hash (not doc_id) catches same-content/different-id
re-crawls, matching functions.dedup.exact_dedup's definition of "exact".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    df: DataFrame,
    content_col: str,
    event_time_col: str,
    delay: str = "10 minutes",
    hash_col: str = "__content_md5__",
    keep_hash: bool = False,
) -> DataFrame:
    """Drop rows whose content hash was already seen within the watermark.

    ``df`` must be a streaming DataFrame with an event-time column; output
    carries the first arrival of each distinct content value per watermark
    window. State size is bounded: keys evict as the watermark advances."""
    out = (
        df.withColumn(hash_col, F.md5(F.col(content_col).cast("string")))
        .withWatermark(event_time_col, delay)
        .dropDuplicatesWithinWatermark([hash_col])
    )
    return out if keep_hash else out.drop(hash_col)
