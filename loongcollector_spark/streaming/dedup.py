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


def time_bounded_dedup_admit(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    delay_sec: float,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """BATCH replay of watermark-bounded dedup's admit set: per key, in
    event-time order, a row is admitted iff it arrives more than
    ``delay_sec`` after the LAST ADMITTED row of the same key (the first
    arrival always admits). This is the event-by-event limit of
    ``dropDuplicatesWithinWatermark`` — streaming state for a key holds the
    admitted row's event time and evicts once the watermark
    (max-event-time - delay) passes it, so a duplicate re-admits exactly
    when its gap from the previous admission exceeds the delay. The
    streaming operator reaches this answer as micro-batches shrink
    (watermarks only advance between batches); the replay is the
    deterministic algebra an external oracle can verify. ``ts_col`` must be
    epoch seconds (double), like the token bucket's.

    Scale shape: one hash shuffle on the key columns, a per-partition sort
    on (keys, ts, tiebreaks), then ONE ``mapInPandas`` pass per partition —
    the per-key state lives in a dict that carries across the partition's
    Arrow batches. (The obvious ``groupBy().applyInPandas`` form makes one
    Python call per group — at millions of tiny keys that is millions of
    UDF invocations; this form makes one generator per partition.)
    ``tiebreak_cols`` pins the within-timestamp order so the admit set is
    deterministic under equal timestamps."""
    import numpy as np

    parts = df.repartition(*[F.col(k) for k in key_cols]).sortWithinPartitions(
        *key_cols, ts_col, *(tiebreak_cols or [])
    )
    out_schema = df.schema

    def scan(batches):
        last: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            keys = list(zip(*[pdf[k] for k in key_cols]))
            ts = pdf[ts_col].to_numpy(dtype="float64")
            keep = np.zeros(len(pdf), dtype=bool)
            for i, (k, t) in enumerate(zip(keys, ts)):
                if t - last.get(k, float("-inf")) > delay_sec:
                    last[k] = t
                    keep[i] = True
            yield pdf[keep]

    return parts.mapInPandas(scan, schema=out_schema)
