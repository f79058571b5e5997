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
