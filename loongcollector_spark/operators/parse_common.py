"""Shared keep/discard semantics for every parser.

The reference gives every parser the same failure matrix via
``CommonParserOptions`` (core/plugin/processor/CommonParserOptions.cpp:92-118):

- on parse FAILURE: keep the raw source value (``KeepingSourceWhenParseFail``),
  optionally copy the raw line to ``__raw_log__`` (``CopingRawLog``), or erase
  the event entirely (``ShouldEraseEvent``) — every parser is a project+filter.
- on parse SUCCESS: optionally keep the source field
  (``KeepingSourceWhenParseSucceed``), optionally renamed.

Columnar mapping: "erase the event" = ``filter``; "remove the source key" on a
per-row basis = null-out the source column on those rows (fixed schema); the
``__raw_log__`` copy is a conditional column.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RAW_LOG_KEY = "__raw_log__"


@dataclass(frozen=True)
class ParserOptions:
    keep_source_on_fail: bool = True
    keep_source_on_success: bool = False
    copy_raw_log: bool = False
    renamed_source_key: str | None = None

    def should_erase_on_fail(self) -> bool:
        # CommonParserOptions::ShouldEraseEvent: a failed event survives only
        # if the raw source is being kept somewhere.
        return not (self.keep_source_on_fail or self.copy_raw_log)


def extended_schema(df: DataFrame, string_fields, extra_field=None):
    """Output StructType for mapInPandas parsers: the input schema plus new
    string fields (and one optional typed marker field). Built
    programmatically — ``schema.simpleString()`` does not quote field names,
    so DDL round-tripping breaks on columns like ``__tag__:__path__``."""
    from pyspark.sql.types import StringType, StructField, StructType

    fields = list(df.schema.fields) + [
        StructField(name, StringType()) for name in string_fields
    ]
    if extra_field is not None:
        fields.append(extra_field)
    return StructType(fields)


def apply_parser_options(
    df: DataFrame,
    source_key: str,
    success: Column,
    extracted: dict[str, Column],
    options: ParserOptions,
) -> DataFrame:
    """Apply the parse-fail truth table around a parser's extracted columns.

    ``success`` is a boolean Column; ``extracted`` maps new column name ->
    expression (evaluated only meaningfully when success holds).
    """
    out = df
    for name, expr in extracted.items():
        if name in df.columns:
            # chained parsers: only successful rows overwrite a key written
            # by an earlier parser (reference parsers add contents on match
            # only — failure leaves prior contents intact)
            out = out.withColumn(name, F.when(success, expr).otherwise(F.col(name)))
        else:
            out = out.withColumn(name, F.when(success, expr))

    if options.copy_raw_log:
        out = out.withColumn(
            RAW_LOG_KEY, F.when(~success, F.col(source_key))
        )

    if options.should_erase_on_fail():
        out = out.filter(success)
    elif not options.keep_source_on_fail:
        # failure rows survive only through __raw_log__; drop raw from source
        out = out.withColumn(
            source_key, F.when(success, F.col(source_key))
        )

    src = options.renamed_source_key or source_key
    if not options.keep_source_on_success:
        out = out.withColumn(src, F.when(~success, F.col(source_key)))
        if src != source_key:
            out = out.drop(source_key)
    elif src != source_key:
        out = out.withColumnRenamed(source_key, src)
    return out
