"""Delimiter/CSV field extraction — ``processor_parse_delimiter_native`` /
``processor_csv`` / ``processor_split_char`` / ``processor_split_string``.

Reference semantics (core/plugin/processor/ProcessorParseDelimiterNative.cpp):
split SourceKey by a separator (quote-aware FSM when Quote set); short rows
allowed via ``AllowingShortenedFields`` (missing keys absent → null columns);
overflow (more fields than Keys) handled by ``OverflowedFieldsTreatment``:
  - keep:    extra fields re-joined into the LAST key (lines 256-276)
  - discard: extra fields dropped
  - extend:  extra fields become ``__column{idx}__`` contents (naming: line 338)

Spark-first: unquoted split is a single JVM ``split`` + ``element_at`` chain
(whole-stage codegen); quoted parsing delegates to ``from_csv`` which
implements the RFC-4180 FSM natively.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from loongcollector_spark.operators.parse_common import ParserOptions, apply_parser_options

OVERFLOW_KEEP = "keep"
OVERFLOW_DISCARD = "discard"
OVERFLOW_EXTEND = "extend"


def parse_delimiter(
    df: DataFrame,
    source_key: str,
    separator: str,
    keys: Sequence[str],
    quote: str | None = None,
    allow_shortened: bool = False,
    overflow: str = OVERFLOW_DISCARD,
    max_extend_columns: int = 8,
    options: ParserOptions | None = None,
) -> DataFrame:
    options = options or ParserOptions()
    n = len(keys)
    tmp = "__fields__"

    if quote:
        # RFC-CSV path: from_csv with all-string schema sized n + extend slots
        width = n + (max_extend_columns if overflow == OVERFLOW_EXTEND else 1)
        csv_schema = ", ".join(f"_c{i} string" for i in range(width))
        csv_opts = {"sep": separator, "quote": quote, "mode": "PERMISSIVE"}
        parsed = F.from_csv(F.col(source_key), csv_schema, csv_opts)
        arr = F.array(*[parsed[f"_c{i}"] for i in range(width)])
        out = df.withColumn(tmp, F.filter(arr, lambda x: x.isNotNull()))
    else:
        out = df.withColumn(
            tmp, F.split(F.col(source_key), re.escape(separator))
        )

    size = F.size(F.col(tmp))
    min_fields = 1 if allow_shortened else n
    success = F.col(source_key).isNotNull() & (size >= min_fields)

    extracted: dict[str, F.Column] = {}
    for i, k in enumerate(keys):
        val = F.try_element_at(F.col(tmp), F.lit(i + 1))
        if i == n - 1 and overflow == OVERFLOW_KEEP:
            # re-join overflow into the last key
            val = F.when(
                size > n,
                F.array_join(F.slice(F.col(tmp), n, 100000), separator),
            ).otherwise(val)
        extracted[k] = val
    if overflow == OVERFLOW_EXTEND:
        for j in range(max_extend_columns):
            idx = n + j
            extracted[f"__column{idx}__"] = F.when(
                size > idx, F.try_element_at(F.col(tmp), F.lit(idx + 1))
            )

    out = apply_parser_options(out, source_key, success, extracted, options)
    return out.drop(tmp)


def split_string(
    df: DataFrame, source_key: str, separator: str, dest: str = "parts"
) -> DataFrame:
    """processor_split_string (plugins/processor/split/string): string split
    into an array column (no key projection)."""
    return df.withColumn(dest, F.split(F.col(source_key), re.escape(separator)))


def split_to_rows(
    df: DataFrame, source_key: str, separator: str = "\n", keep_empty: bool = False
) -> DataFrame:
    """processor_split_log_string (split one event into N by separator) —
    plugins/processor/split/logstring + the inner
    ProcessorSplitLogStringNative (split RawEvent by '\\n'/'\\0')."""
    parts = F.split(F.col(source_key), re.escape(separator))
    if not keep_empty:
        parts = F.filter(parts, lambda x: x != "")
    return df.withColumn(source_key, F.explode(parts))
