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


def _with_csv_fields(
    df: DataFrame,
    out_col: str,
    source_key: str,
    sep: str,
    width: int,
    quote: str,
    csv_opts: dict,
) -> DataFrame:
    """Add ``out_col``: the CSV record of ``source_key`` as an array of
    exactly the fields present — positions <= the record's field count are
    strings (empty fields stay \"\" — univocity maps them to null,
    indistinguishable from absent trailing columns, so the count is
    recomputed from the raw line with quoted regions blanked), positions
    beyond are null. An empty source is one empty field (Go csv io.EOF).

    Staged through real columns so the expensive ``from_csv`` is evaluated
    ONCE per row: inlining it into the per-element transform lambda costs
    width² parses per row (CollapseProject keeps a non-cheap multi-referenced
    projection as its own stage)."""
    src = F.col(source_key)
    csv_schema = ", ".join(f"_c{i} string" for i in range(width))
    struct_col, raw_col = f"{out_col}_struct__", f"{out_col}_raw__"
    df = df.withColumn(struct_col, F.from_csv(src, csv_schema, csv_opts))
    df = df.withColumn(
        raw_col, F.array(*[F.col(struct_col)[f"_c{i}"] for i in range(width)])
    )
    q = re.escape(quote)
    stripped = F.regexp_replace(src, f"{q}(?:[^{q}]|{q}{q})*{q}", "")
    n_fields = F.when(src == "", F.lit(1)).otherwise(
        F.size(F.split(stripped, re.escape(sep)))
    )
    idxs = F.sequence(F.lit(1), F.lit(width))
    eff = F.transform(
        idxs,
        lambda i: F.when(
            i <= n_fields,
            F.coalesce(F.try_element_at(F.col(raw_col), i), F.lit("")),
        ),
    )
    return df.withColumn(out_col, eff).drop(struct_col, raw_col)


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
        csv_opts = {"sep": separator, "quote": quote, "mode": "PERMISSIVE"}
        out = _with_csv_fields(df, tmp, source_key, separator, width, quote, csv_opts)
        out = out.withColumn(tmp, F.filter(F.col(tmp), lambda x: x.isNotNull()))
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


DECODE_PRESERVE_KEY = "_decode_preserve_"


def _csv_encode_cell(sep: str):
    """Go encoding/csv Writer quoting rule (fieldNeedsQuotes): quote a field
    containing the separator / quote / CR / LF, or starting with whitespace;
    embedded quotes double."""

    def enc(cell: F.Column) -> F.Column:
        needs = (
            cell.contains(sep)
            | cell.contains('"')
            | cell.contains("\n")
            | cell.contains("\r")
            | cell.rlike(r"^\s")
        )
        quoted = F.concat(F.lit('"'), F.regexp_replace(cell, '"', '""'), F.lit('"'))
        return F.when(needs, quoted).otherwise(cell)

    return enc


def parse_csv(
    df: DataFrame,
    source_key: str,
    keys: Sequence[str],
    sep: str = ",",
    trim_leading_space: bool = False,
    preserve_others: bool = False,
    expand_others: bool = False,
    expand_key_prefix: str | None = None,
    keep_source: bool = False,
    max_expand_columns: int = 8,
) -> DataFrame:
    """``processor_csv`` (plugins/processor/csv/processor_csv.go:30-116): RFC
    CSV decode of SourceKey into SplitKeys with the Go processor's options —

    - ``trim_leading_space``: TrimLeadingSpace (csv.Reader.TrimLeadingSpace)
    - ``preserve_others``: overflow fields re-encoded (Go csv.Writer quoting
      rules) into ``_decode_preserve_`` (lines 98-107)
    - ``expand_others`` (+ required ``expand_key_prefix``): overflow fields
      become ``{prefix}1..N`` instead (lines 93-97)
    - ``keep_source``: retain SourceKey after successful decode (line 135)

    Spark-first: ``from_csv`` runs the RFC-4180 FSM JVM-side (escape='"' for
    Go-compatible doubled-quote semantics); overflow re-encode is a pure
    column expression. Fixed-width plan: at most ``max_expand_columns``
    overflow fields are decoded (plan-time schema width; the reference is
    unbounded — size the cap to the widest expected record). An empty source
    decodes to one empty field (the io.EOF branch, line 84)."""
    if expand_others and preserve_others and expand_key_prefix is None:
        # '' is Go-valid (the zero value: overflow fields named '1','2',...,
        # processor_csv.go:92); only an omitted prefix is an API error here
        raise ValueError("expand_key_prefix is required when expand_others=True")
    src = F.col(source_key)
    n = len(keys)
    if n == 0:
        # no SplitKeys: optionally stash the raw record (lines 61-66)
        out = df.withColumn(DECODE_PRESERVE_KEY, src) if preserve_others else df
        return out if keep_source else out.drop(source_key)

    width = n + (max_expand_columns if preserve_others else 0)
    csv_opts = {
        "sep": sep,
        "quote": '"',
        "escape": '"',
        "mode": "PERMISSIVE",
        "ignoreLeadingWhiteSpace": "true" if trim_leading_space else "false",
        "ignoreTrailingWhiteSpace": "false",
    }
    tmp = "__csv__"
    out = _with_csv_fields(df, tmp, source_key, sep, width, '"', csv_opts)
    n_present = F.size(F.filter(F.col(tmp), lambda x: x.isNotNull()))
    for i, k in enumerate(keys):
        out = out.withColumn(k, F.try_element_at(F.col(tmp), F.lit(i + 1)))
    if preserve_others:
        if expand_others:
            for j in range(max_expand_columns):
                out = out.withColumn(
                    f"{expand_key_prefix}{j + 1}",
                    F.try_element_at(F.col(tmp), F.lit(n + j + 1)),
                )
        else:
            remainder = F.filter(
                F.slice(F.col(tmp), n + 1, max_expand_columns),
                lambda x: x.isNotNull(),
            )
            out = out.withColumn(
                DECODE_PRESERVE_KEY,
                F.when(
                    n_present > n,
                    F.array_join(F.transform(remainder, _csv_encode_cell(sep)), sep),
                ),
            )
    out = out.drop(tmp)
    if not keep_source:
        # source is kept only on decode failure; the univocity FSM decodes
        # leniently (it does not raise the Go bare-quote errors), so a
        # non-null source always counts as decoded
        out = out.drop(source_key)
    return out


def split_string(
    df: DataFrame, source_key: str, separator: str, dest: str = "parts"
) -> DataFrame:
    """processor_split_string (plugins/processor/split/string): string split
    into an array column (no key projection)."""
    return df.withColumn(dest, F.split(F.col(source_key), re.escape(separator)))


SPLIT_PRESERVE_KEY = "_split_preserve_"


def split_string_fields(
    df: DataFrame,
    source_key: str,
    separator: str,
    keys: Sequence[str],
    preserve_others: bool = False,
    expand_others: bool = False,
    expand_key_prefix: str = "",
    keep_source: bool = False,
    max_expand_columns: int = 8,
) -> DataFrame:
    """processor_split_string key projection (split_string.go:60-110):
    split SourceKey by the multi-byte literal SplitSep and assign pieces to
    SplitKeys. Fewer pieces than keys leaves the tail keys null (the Go
    appends only what exists, :80-88). Overflow pieces, when
    ``preserve_others`` (SplitN count = len(keys)+1, :74-78):

    - ``expand_others``: ``{prefix}1..N`` fields (:93-96), plan-width capped
      at ``max_expand_columns`` (the reference is unbounded — size the cap);
    - else the UNSPLIT remainder (separators intact) lands in
      ``_split_preserve_`` (:97-99).

    Empty ``keys`` mirrors :61-73 — the whole value expands (or lands in
    ``_split_preserve_`` verbatim); nothing happens without
    ``preserve_others``. One JVM split + pure column projections."""
    if not separator:
        # Go Init fails the config ('no split separator', split_string.go:
        # 49-51); F.split('') would silently explode per character
        raise ValueError(
            "split_string_fields: no split separator (split_string.go:49-51)"
        )
    src = F.col(source_key)
    parts = F.split(src, re.escape(separator))
    size = F.size(parts)
    n = len(keys)
    out = df
    cols: dict[str, F.Column] = {}
    if n:
        for i, k in enumerate(keys):
            cols[k] = F.try_element_at(parts, F.lit(i + 1))
    if preserve_others:
        if expand_others:
            lo = n if n else 0
            for j in range(max_expand_columns):
                cols[f"{expand_key_prefix}{j + 1}"] = F.when(
                    size > lo + j, F.try_element_at(parts, F.lit(lo + j + 1))
                )
        elif n:
            cols[SPLIT_PRESERVE_KEY] = F.when(
                size > n, F.array_join(F.slice(parts, n + 1, 2147483647), separator)
            )
        else:
            cols[SPLIT_PRESERVE_KEY] = src
    out = out.withColumns(cols)
    return out if keep_source else out.drop(source_key)


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
