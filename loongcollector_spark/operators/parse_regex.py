"""Regex field extraction — ``processor_parse_regex_native`` /
``processor_regex``.

Reference behavior (core/plugin/processor/ProcessorParseRegexNative.cpp:181-248
and plugins/processor/regex/regex.go:55-67): match ``SourceKey`` against a
compiled regex with capture groups; on match, write group i to ``Keys[i]``;
on mismatch apply the CommonParserOptions failure matrix; the ``(.*)``
whole-line pattern takes a copy-through fast path; ``FullMatch`` toggles
anchored matching.

Spark-first: the default engine is pure JVM expressions — one ``rlike`` for
the success predicate plus one ``regexp_extract`` per key, all fused by
whole-stage codegen (regex compiled once per task by Catalyst, mirroring the
reference's compile-at-Init). An Arrow engine (`engine="arrow"`) does a
single-pass vectorized ``Series.str.extract`` for many-group patterns where
one pass beats k JVM scans.
"""

from __future__ import annotations

import re
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from loongcollector_spark.operators.parse_common import ParserOptions, apply_parser_options

_FASTPATH_WHOLE_LINE = ("(.*)", "^(.*)$")


def parse_regex(
    df: DataFrame,
    source_key: str,
    pattern: str,
    keys: Sequence[str],
    options: ParserOptions | None = None,
    full_match: bool = True,
    engine: str = "jvm",
) -> DataFrame:
    options = options or ParserOptions()

    if pattern in _FASTPATH_WHOLE_LINE and len(keys) == 1:
        # whole-line fast path (ProcessorParseRegexNative.cpp:103-121)
        return apply_parser_options(
            df, source_key, F.col(source_key).isNotNull(),
            {keys[0]: F.col(source_key)}, options,
        )

    if engine == "arrow":
        return _parse_regex_arrow(df, source_key, pattern, keys, options, full_match)

    anchored = pattern if not full_match else _anchor(pattern)
    src = F.col(source_key)
    success = src.isNotNull() & src.rlike(anchored)
    extracted = {
        k: F.regexp_extract(src, anchored, i + 1) for i, k in enumerate(keys)
    }
    return apply_parser_options(df, source_key, success, extracted, options)


def _anchor(pattern: str) -> str:
    p = pattern
    if not p.startswith("^"):
        p = "^" + p
    if not p.endswith("$"):
        p = p + "$"
    return p


def _parse_regex_arrow(
    df: DataFrame,
    source_key: str,
    pattern: str,
    keys: Sequence[str],
    options: ParserOptions,
    full_match: bool,
) -> DataFrame:
    """Single-pass vectorized extraction (Arrow batches, no per-row Python)."""
    anchored = _anchor(pattern) if full_match else pattern
    from pyspark.sql.types import BooleanType, StructField

    from loongcollector_spark.operators.parse_common import extended_schema

    schema = extended_schema(df, keys, StructField("__parse_ok__", BooleanType()))

    compiled = re.compile(anchored)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            s = pdf[source_key]
            ext = s.str.extract(compiled, expand=True)
            ext.columns = list(keys)
            ok = ext[keys[0]].notna() if len(keys) else s.notna()
            res = pdf.copy()
            for k in keys:
                res[k] = ext[k]
            res["__parse_ok__"] = ok.fillna(False)
            yield res

    parsed = df.mapInPandas(extract, schema=schema)
    success = F.col("__parse_ok__")
    out = apply_parser_options(
        parsed, source_key, success, {k: F.col(k) for k in keys}, options
    )
    return out.drop("__parse_ok__")
