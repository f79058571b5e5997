"""Stateful streaming rate limit — the token-bucket processor, Spark-first.

The reference keeps one token bucket per distinct value-combo of ``Fields``
(plugins/processor/ratelimit/processor_rate_limit.go:27-57; bucket refill
logic token_bucket.go:33-61): events draw a token, empty bucket → drop.

Spark mapping: ``applyInPandasWithState`` groups the stream by the key
columns and keeps ``(tokens_left, last_refill_epoch)`` as GroupState — the
exact bucket state, checkpointed by the streaming engine instead of the
reference's in-memory map. Within a micro-batch the bucket drains in event-
time order, vectorized per group (numpy cumsum, no per-row Python).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "tokens_left double, last_refill double"

_UNIT_SECONDS = {"s": 1.0, "m": 60.0, "h": 3600.0}


def parse_limit(limit: str) -> Tuple[float, float]:
    """Parse the reference's "N/s|m|h" limit string → (burst, tokens_per_sec)."""
    n, _, unit = limit.partition("/")
    seconds = _UNIT_SECONDS.get(unit or "s", 1.0)
    burst = float(n)
    return burst, burst / seconds


def _drain_bucket(ts, burst: float, rate: float, tokens_left: float, last_refill: float):
    """The bucket drain recurrence over event-time-sorted timestamps —
    shared by the streaming limiter and the batch replay twin so the admit
    algebra cannot drift between them. Bucket updates are order-dependent;
    groups are small per micro-batch, and the arithmetic stays in C floats."""
    keep = []
    for t in ts:
        if last_refill == float("-inf"):
            last_refill = t
        tokens_left = min(burst, tokens_left + max(t - last_refill, 0.0) * rate)
        last_refill = max(last_refill, t)
        if tokens_left >= 1.0:
            tokens_left -= 1.0
            keep.append(True)
        else:
            keep.append(False)
    return keep, tokens_left, last_refill


def streaming_rate_limit(
    df: DataFrame,
    fields: list[str],
    limit: str,
    ts_col: str = "ts",
) -> DataFrame:
    """Token-bucket rate limit over a streaming DataFrame grouped by
    ``fields``. ``ts_col`` must be epoch seconds (double); rows that find the
    bucket empty are dropped, mirroring ProcessRateLimit's disposal path."""
    burst, rate = parse_limit(limit)
    out_schema = df.schema

    def limiter(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            tokens_left, last_refill = state.get
        else:
            tokens_left, last_refill = burst, float("-inf")
        # the engine may split one group into several Arrow chunks with
        # arbitrary cross-chunk order; the bucket drain is order-dependent,
        # so materialize the whole group and sort by event time ONCE
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            # stable sort: equal-timestamp rows keep their arrival order
            # instead of quicksort's arbitrary (run-varying) permutation
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            ts = pdf[ts_col].to_numpy(dtype="float64")
            keep, tokens_left, last_refill = _drain_bucket(
                ts, burst, rate, tokens_left, last_refill
            )
            yield pdf[pd.Series(keep, index=pdf.index)]
        state.update((float(tokens_left), float(last_refill)))

    return df.groupBy(*fields).applyInPandasWithState(
        limiter,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def token_bucket_admit(
    df: DataFrame,
    fields: list[str],
    limit: str,
    ts_col: str = "ts",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """BATCH replay of the token bucket's admit set: each key's full history
    drains through the exact streaming recurrence (_drain_bucket) in one
    applyInPandas group — the oracle-comparable twin of streaming_rate_limit
    (a stream split into micro-batches admits the same rows because the
    bucket state carries across batches; asserted in test_streaming.py).
    ``ts_col`` must be epoch seconds (double). Scale shape: one shuffle on
    the key columns, then a per-group sequential drain — the recurrence is
    inherently ordered, so parallelism comes from key count, exactly like
    the reference's per-key bucket map. ``tiebreak_cols`` pins the order of
    equal-timestamp rows (pandas' default sort is unstable, so without it
    WHICH tied row drains the last token is nondeterministic)."""
    burst, rate = parse_limit(limit)
    out_schema = df.schema
    sort_cols = [ts_col] + list(tiebreak_cols or [])

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        ts = pdf[ts_col].to_numpy(dtype="float64")
        keep, _, _ = _drain_bucket(ts, burst, rate, burst, float("-inf"))
        return pdf[pd.Series(keep, index=pdf.index)]

    return df.groupBy(*fields).applyInPandas(replay, schema=out_schema)
