"""Streaming windowed metrics rollup — the streaming twin of
``aggregate.sink_metrics``.

The reference emits its self-monitoring counters periodically per pipeline
(pluginmanager/metric_export.go; per-interval metric records). Structured
Streaming's event-time equivalent: a watermarked tumbling-window aggregation
per (window, source) — late rows within the watermark still update their
window, rows later than the watermark are dropped and the window state is
reclaimed (bounded state: without the watermark a 10^12-row stream would
accumulate window state forever).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_windowed_rollup(
    df: DataFrame,
    ts_col: str,
    source_col: str,
    tokens_col: str | None = None,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Per-(event-time window, source) rows[/tokens] with late-data handling.
    Output: (window_start, window_end, source, rows[, tokens])."""
    aggs = [F.count(F.lit(1)).alias("rows")]
    if tokens_col:
        aggs.append(F.sum(F.col(tokens_col).cast("long")).alias("tokens"))
    out = (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration), F.col(source_col))
        .agg(*aggs)
    )
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        source_col,
        *(["rows"] + (["tokens"] if tokens_col else [])),
    )


def streaming_session_rollup(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming sessionization — the event-time twin of the batch
    ``sessionize_events`` query (aggregator_context's per-source activity
    grouping, but gap-closed): rows of a key belong to one session while
    consecutive event times are within ``gap``; a quiet period closes the
    session and its state is emitted and reclaimed once the watermark
    passes.

    Built on Spark's native ``session_window`` (dynamic-gap merge inside
    the streaming state store) — no custom applyInPandasWithState needed;
    state per key is bounded by the watermark, and sessions that span
    micro-batches merge exactly (the store merges overlapping windows).
    Output: (key..., session_start, session_end, events)."""
    out = (
        df.withWatermark(ts_col, watermark)
        .groupBy(*[F.col(k) for k in key_cols], F.session_window(F.col(ts_col), gap))
        .agg(F.count(F.lit(1)).alias("events"))
    )
    return out.select(
        *key_cols,
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "events",
    )
