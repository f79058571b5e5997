"""Key/value splitting — ``processor_split_key_value``.

Reference (plugins/processor/split/keyvalue/key_value_splitter.go:29-48):
split SourceKey into pairs by ``Delimiter``, each pair into key/value by
``Separator``; quote handling; pairs without a separator get
``no_separator_key_prefix``; empty keys get ``empty_key_prefix``.

Spark-first: ``str_to_map`` is the single-expression JVM path for the common
case; the prefixing edge cases are an array-of-structs transform (still pure
JVM expressions).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_key_value(
    df: DataFrame,
    source_key: str,
    pair_delimiter: str = "\t",
    kv_separator: str = ":",
    map_column: str = "kv",
    keys: list[str] | None = None,
    no_separator_key_prefix: str | None = None,
    expand_keys: bool = False,
    sample_rows: int | None = None,
) -> DataFrame:
    """``expand_keys=True`` additionally projects every discovered key to a
    top-level column (the reference emits flat log fields, not a nested map;
    key_value_splitter.go:110-130). Discovery is a plan-time distinct-scan of
    the map keys — bound it with ``sample_rows`` or pass ``keys`` explicitly
    on the 100 TB path (same trade as SPL's parse-kv stage)."""
    src = F.col(source_key)
    if no_separator_key_prefix is None:
        m: Column = F.str_to_map(
            src, F.lit(re.escape(pair_delimiter)), F.lit(re.escape(kv_separator))
        )
    else:
        pairs = F.split(src, re.escape(pair_delimiter))
        sep = re.escape(kv_separator)

        def to_entry(i: Column, p: Column) -> Column:
            has_sep = p.rlike(sep)
            key = F.when(has_sep, F.regexp_extract(p, f"^(.*?){sep}", 1)).otherwise(
                F.concat(F.lit(no_separator_key_prefix), (i + 1).cast("string"))
            )
            val = F.when(has_sep, F.regexp_replace(p, f"^(.*?){sep}", "")).otherwise(p)
            return F.struct(key.alias("key"), val.alias("value"))

        entries = F.zip_with(
            F.sequence(F.lit(0), F.size(pairs) - 1), pairs, to_entry
        )
        m = F.map_from_entries(entries)

    out = df.withColumn(map_column, m)
    project = list(keys or [])
    if expand_keys and not project:
        project = discover_keys(out, map_column, sample_rows)
    for k in project:
        out = out.withColumn(k, F.try_element_at(F.col(map_column), F.lit(k)))
    return out


def discover_keys(
    df: DataFrame, map_column: str = "kv", sample_rows: int | None = None
) -> list[str]:
    """Plan-time distinct-scan of the map keys (sorted). Exposed so callers
    that compile repeatedly over the same spec — the streaming foreachBatch
    runner — can discover ONCE and freeze the projected column set instead
    of re-discovering per micro-batch (which would give each batch=<id>
    output directory its own schema)."""
    src_keys = df.select(map_column)
    if sample_rows:
        src_keys = src_keys.limit(sample_rows)
    return sorted(
        r.k
        for r in src_keys.select(
            F.explode(F.map_keys(F.col(map_column))).alias("k")
        ).distinct().collect()
    )
