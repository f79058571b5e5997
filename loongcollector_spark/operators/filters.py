"""Row filters & key governance — the reference's filter/drop/pick family.

- ``processor_filter_regex_native`` 3 modes (ProcessorFilterNative.cpp:30-105):
  expression tree (AND/OR/NOT over key~regex leaves), rule mode (all
  FilterKey[i]~FilterRegex[i] must match), legacy Include/Exclude maps.
- ``processor_filter_regex`` (Go): Include = all must match; Exclude = any
  match drops.
- ``processor_filter_key_regex``: keep events whose key NAMES match.
- ``processor_drop`` / ``processor_pick_key`` / ``processor_drop_last_key``.
- ``processor_rate_limit``: token-bucket per distinct Fields value-combo
  (plugins/processor/ratelimit/token_bucket.go:33-61) — batch analogue is a
  per-key ranked window; the streaming twin lives in streaming/.
- ``processor_fields_with_condition``: switch-case add/drop actions
  (processor_fields_with_condition.go:31-81).

All pure Column expressions → fused by codegen; the only shuffle in this
module is rate_limit's per-key window (inherent to "first N per key").
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# --- filter expression tree (ConditionExp) ---------------------------------

def condition_tree(expr: Any) -> Column:
    """Build a boolean Column from a nested dict expression tree:
    {"and": [...]}, {"or": [...]}, {"not": x}, or a leaf
    {"key": col, "regex": pat} / {"key": col, "equals": v} /
    {"key": col, "contains": s} / {"key": col, "startwith": s}
    (leaf kinds per processor_fieldswithcondition.go:66-81 and the native
    filter tree)."""
    if isinstance(expr, Mapping):
        if "and" in expr:
            cols = [condition_tree(e) for e in expr["and"]]
            out = cols[0]
            for c in cols[1:]:
                out = out & c
            return out
        if "or" in expr:
            cols = [condition_tree(e) for e in expr["or"]]
            out = cols[0]
            for c in cols[1:]:
                out = out | c
            return out
        if "not" in expr:
            return ~condition_tree(expr["not"])
        key = F.col(expr["key"])
        if "regex" in expr:
            return key.rlike(expr["regex"])
        if "equals" in expr:
            return key == F.lit(expr["equals"])
        if "contains" in expr:
            return key.contains(expr["contains"])
        if "startwith" in expr:
            return key.startswith(expr["startwith"])
    raise ValueError(f"bad condition expression: {expr!r}")


def filter_expression(df: DataFrame, expr: Any) -> DataFrame:
    return df.filter(condition_tree(expr))


def filter_rule(df: DataFrame, keys: Sequence[str], regexes: Sequence[str]) -> DataFrame:
    """Rule mode: ALL FilterKey[i] ~ FilterRegex[i] must match."""
    cond = F.lit(True)
    for k, r in zip(keys, regexes):
        cond = cond & F.col(k).rlike(r)
    return df.filter(cond)


def filter_include_exclude(
    df: DataFrame,
    include: Mapping[str, str] | None = None,
    exclude: Mapping[str, str] | None = None,
) -> DataFrame:
    """Include: all key~regex must match to keep. Exclude: any match drops."""
    out = df
    if include:
        cond = F.lit(True)
        for k, r in include.items():
            cond = cond & F.col(k).isNotNull() & F.col(k).rlike(r)
        out = out.filter(cond)
    if exclude:
        cond = F.lit(False)
        for k, r in exclude.items():
            cond = cond | (F.col(k).isNotNull() & F.col(k).rlike(r))
        out = out.filter(~cond)
    return out


# --- key governance ---------------------------------------------------------

def drop_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    return df.drop(*keys)


def drop_last_key(df: DataFrame, include: Sequence[str], drop_key: str) -> DataFrame:
    """processor_drop_last_key (processor_drop_last_key.go:25-60): drop the
    raw key once processing succeeded — per event, DropKey is removed iff
    every Include key is present. Columnar analogue: null the column where
    all include columns are non-null (schema-static, per-row values)."""
    if not include or not drop_key:
        raise ValueError("drop_last_key: Include and DropKey are mandatory "
                         "(processor_drop_last_key.go Init)")
    cond = F.col(include[0]).isNotNull()
    for k in include[1:]:
        cond = cond & F.col(k).isNotNull()
    return df.withColumn(
        drop_key, F.when(cond, F.lit(None)).otherwise(F.col(drop_key))
    )


def pick_keys(
    df: DataFrame,
    include: Sequence[str] | None = None,
    exclude: Sequence[str] | None = None,
) -> DataFrame:
    if include:
        return df.select(*[c for c in df.columns if c in set(include)])
    if exclude:
        return df.drop(*exclude)
    return df


def filter_key_regex(df: DataFrame, key_pattern: str) -> DataFrame:
    """Schema-level: project to columns whose NAME matches (columnar analogue
    of per-event key-name filtering)."""
    import re

    pat = re.compile(key_pattern)
    keep = [c for c in df.columns if pat.fullmatch(c)]
    return df.select(*keep)


# --- rate limit (batch analogue) --------------------------------------------

def rate_limit(
    df: DataFrame,
    fields: Sequence[str],
    limit: int,
    order_by: Sequence[str] | None = None,
) -> DataFrame:
    """Keep at most ``limit`` rows per distinct value-combination of
    ``fields`` (batch analogue of the token bucket; deterministic via
    order_by). Scale note: the row_number+filter shape triggers Catalyst's
    WindowGroupLimit pushdown — each MAP task keeps only ``limit`` rows per
    key before the shuffle (a Partial WindowGroupLimit below the Exchange,
    asserted in tests), so a Zipf-hot key moves at most limit×partitions
    rows, not its whole volume. ``rate_limit_sampled`` below avoids even
    that shuffle when no ordering is required."""
    order_cols = [F.col(c) for c in (order_by or fields)]
    w = Window.partitionBy(*[F.col(f) for f in fields]).orderBy(*order_cols)
    return (
        df.withColumn("__rl_rn__", F.row_number().over(w))
        .filter(F.col("__rl_rn__") <= limit)
        .drop("__rl_rn__")
    )


def rate_limit_sampled(
    df: DataFrame,
    fields: Sequence[str],
    limit: int,
    id_expr: Column,
) -> DataFrame:
    """Hot-key-safe rate limit. The exact window form
    (``rate_limit``) routes each key's every row through ONE task to assign
    ordinals — with a Zipfian key the head key serializes the stage. Here:

    1. exact per-key counts (one tiny aggregate — Spark's partial
       aggregation spreads the hot key across map tasks),
    2. counts broadcast back, so the keep-decision is MAP-SIDE: keys within
       ``limit`` pass untouched; an over-limit key keeps the deterministic
       hash-slice ``pmod(xxhash64(id), ceil(cnt/limit)) == 0`` — ~limit rows,
       order-insensitive, identical on retry.

    The fact table never shuffles. Trade-off vs the reference's token bucket
    (token_bucket.go:33-61): kept count is ~limit (hash variance), not
    exactly limit — the price of not ordering the key's rows. ``id_expr``
    must be a deterministic per-row expression (e.g. a doc/event id)."""
    from loongcollector_spark.operators.aggregate import broadcast_count_join

    joined = broadcast_count_join(df, list(fields), "__rl_cnt__", "__rl_")
    n_slices = F.ceil(F.col("__rl_cnt__") / limit).cast("long")
    keep = (F.col("__rl_cnt__") <= limit) | (
        F.pmod(F.xxhash64(id_expr), n_slices) == 0
    )
    return joined.filter(keep).drop("__rl_cnt__")


def rate_limit_sampled_by_key(
    df: DataFrame, fields: Sequence[str], limit: int, id_key: str
) -> DataFrame:
    """Config-registry form of rate_limit_sampled: the deterministic row id
    is named by column."""
    return rate_limit_sampled(df, fields, limit, F.col(id_key))


# --- fields_with_condition (switch-case) ------------------------------------

@dataclass
class ConditionCase:
    condition: Any  # condition_tree expression
    add_fields: Mapping[str, str] = field(default_factory=dict)
    drop_keys: Sequence[str] = ()


def fields_with_condition(
    df: DataFrame,
    cases: Sequence[ConditionCase],
    drop_if_not_match: bool = False,
) -> DataFrame:
    """First matching case wins (processor_fields_with_condition.go:66-81).
    add_fields become conditional columns; drop_keys null the column for rows
    that hit that case (columnar analogue of per-row key removal)."""
    conds = [condition_tree(c.condition) for c in cases]
    case_idx: Column = F.lit(-1)
    for i in range(len(cases) - 1, -1, -1):
        case_idx = F.when(conds[i], F.lit(i)).otherwise(case_idx)

    out = df.withColumn("__case__", case_idx)
    new_fields = {k for c in cases for k in c.add_fields}
    for name in sorted(new_fields):
        expr: Column = F.lit(None).cast("string")
        for i in range(len(cases) - 1, -1, -1):
            if name in cases[i].add_fields:
                expr = F.when(F.col("__case__") == i, F.lit(cases[i].add_fields[name])).otherwise(expr)
        out = out.withColumn(name, expr)
    dropped = {k for c in cases for k in c.drop_keys}
    for name in sorted(dropped):
        if name in df.columns:
            cond_drop = F.lit(False)
            for i, c in enumerate(cases):
                if name in c.drop_keys:
                    cond_drop = cond_drop | (F.col("__case__") == i)
            out = out.withColumn(name, F.when(cond_drop, F.lit(None)).otherwise(F.col(name)))
    if drop_if_not_match:
        out = out.filter(F.col("__case__") >= 0)
    return out.drop("__case__")
