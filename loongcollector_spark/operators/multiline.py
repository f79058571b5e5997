"""Multiline split/merge — order-dependent sessionization.

Reference: ``ProcessorSplitMultilineLogStringNative`` /
``ProcessorMergeMultilineLogNative`` (core/plugin/processor/inner/...h) merge
consecutive lines into one event using Start/Continue/End regexes
(core/file_server/MultilineOptions.h:29-51); unmatched leading lines are
discarded or emitted single-line; BY_FLAG mode merges container partial-log
chunks.

Spark-first: a running ``sum(is_start)`` window over (file, offset) assigns a
session id, then a grouped ordered-concat rebuilds each logical event. The
window needs an explicit ordering column — deterministic because our inputs
carry offsets (the reference has the same requirement: per-file byte order).
One shuffle on the file key; at scale the input should already be partitioned
by file so AQE keeps this local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

UNMATCH_DISCARD = "discard"
UNMATCH_SINGLE_LINE = "single_line"


def merge_multiline(
    df: DataFrame,
    line_col: str,
    file_col: str,
    offset_col: str,
    start_pattern: str,
    unmatched: str = UNMATCH_SINGLE_LINE,
    merged_col: str | None = None,
) -> DataFrame:
    """Merge runs of lines starting at ``start_pattern`` into one row whose
    ``line_col`` is the newline-joined block. Output keeps (file, offset of
    block head)."""
    merged_col = merged_col or line_col
    is_start = F.col(line_col).rlike(start_pattern)
    w = (
        Window.partitionBy(file_col)
        .orderBy(offset_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = F.sum(is_start.cast("int")).over(w)
    tagged = df.withColumn("__mls__", sess)

    if unmatched == UNMATCH_DISCARD:
        tagged = tagged.filter(F.col("__mls__") > 0)

    merged = (
        tagged.groupBy(file_col, "__mls__")
        .agg(
            F.min(offset_col).alias(offset_col),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col(offset_col).alias("o"), F.col(line_col).alias("l")))
                    ),
                    lambda s: s["l"],
                ),
                "\n",
            ).alias(merged_col),
        )
        .drop("__mls__")
    )

    if unmatched == UNMATCH_SINGLE_LINE:
        # session 0 (lines before any start) must stay single-line: re-explode
        head = merged  # session>=1 blocks plus one joined session-0 block
        # simplest correct form: recompute with session 0 exploded
        return (
            tagged.withColumn(
                "__emit_single__", (F.col("__mls__") == 0).cast("boolean")
            )
            .groupBy(file_col, "__mls__", "__emit_single__")
            .agg(
                F.min(offset_col).alias("__head_off__"),
                F.array_sort(
                    F.collect_list(F.struct(F.col(offset_col).alias("o"), F.col(line_col).alias("l")))
                ).alias("__lines__"),
            )
            .select(
                file_col,
                F.explode(
                    F.when(
                        F.col("__emit_single__"),
                        F.transform(
                            "__lines__", lambda s: F.struct(s["o"].alias("o"), s["l"].alias("l"))
                        ),
                    ).otherwise(
                        F.array(
                            F.struct(
                                F.col("__head_off__").alias("o"),
                                F.array_join(
                                    F.transform("__lines__", lambda s: s["l"]), "\n"
                                ).alias("l"),
                            )
                        )
                    )
                ).alias("__ev__"),
            )
            .select(
                file_col,
                F.col("__ev__.o").alias(offset_col),
                F.col("__ev__.l").alias(merged_col),
            )
        )
    return merged


def merge_by_flag(
    df: DataFrame,
    line_col: str,
    file_col: str,
    offset_col: str,
    partial_flag_col: str,
    merged_col: str | None = None,
) -> DataFrame:
    """BY_FLAG mode (ProcessorMergeMultilineLogNative.h:26-51): container
    runtimes mark partial chunks; a block ends at the first non-partial row.
    Session id = running count of COMPLETED blocks before this row."""
    merged_col = merged_col or line_col
    w = (
        Window.partitionBy(file_col)
        .orderBy(offset_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    closed_before = F.coalesce(
        F.sum((~F.col(partial_flag_col)).cast("int")).over(w), F.lit(0)
    )
    tagged = df.withColumn("__mls__", closed_before)
    return (
        tagged.groupBy(file_col, "__mls__")
        .agg(
            F.min(offset_col).alias(offset_col),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col(offset_col).alias("o"), F.col(line_col).alias("l")))
                    ),
                    lambda s: s["l"],
                ),
                "",
            ).alias(merged_col),
        )
        .drop("__mls__")
    )


def merge_multiline_rules(
    df: DataFrame,
    line_col: str,
    file_col: str,
    offset_col: str,
    start_pattern: str | None = None,
    continue_pattern: str | None = None,
    end_pattern: str | None = None,
    unmatched: str = UNMATCH_SINGLE_LINE,
    merged_col: str | None = None,
) -> DataFrame:
    """The reference's full multiline rule set
    (ProcessorSplitMultilineLogStringNative.cpp:160-300 /
    MultilineOptions.h:29-51): blocks are delimited by any combination of
    Start / Continue / End regexes —

    - start only: a matching line OPENS a block (delegates to
      merge_multiline, the fast path used everywhere else);
    - end only: a matching line CLOSES the block; every line belongs to
      some block (trailing lines form the final block, which the agent
      would flush on timeout);
    - continue only: a matching line EXTENDS the previous block, so a
      non-matching line opens one; leading continuation lines are
      unmatched;
    - start + end: a block spans start-match .. end-match inclusive;
      lines between an end and the next start are unmatched.

    All modes are one window pass + one groupBy — same shuffle shape as
    the start-only path. ``unmatched`` = 'single_line' (each unmatched
    line its own event) or 'discard'."""
    merged_col = merged_col or line_col
    line = F.col(line_col)
    w_incl = (
        Window.partitionBy(file_col)
        .orderBy(offset_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_excl = (
        Window.partitionBy(file_col)
        .orderBy(offset_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )

    if start_pattern and end_pattern:
        start = line.rlike(start_pattern).cast("int")
        end = line.rlike(end_pattern).cast("int")
        sess = F.sum(start).over(w_incl)
        end_excl = F.coalesce(F.sum(end).over(w_excl), F.lit(0))
        df2 = df.withColumn("__mls__", sess).withColumn("__ends_before__", end_excl)
        base = F.first("__ends_before__").over(
            Window.partitionBy(file_col, "__mls__").orderBy(offset_col)
        )
        df2 = df2.withColumn("__valid__", (F.col("__mls__") > 0) & (F.col("__ends_before__") == base))
    elif end_pattern and not continue_pattern:
        end = line.rlike(end_pattern).cast("int")
        sess = F.coalesce(F.sum(end).over(w_excl), F.lit(0)) + 1
        df2 = df.withColumn("__mls__", sess).withColumn("__valid__", F.lit(True))
    elif continue_pattern and not start_pattern and not end_pattern:
        is_start = (~line.rlike(continue_pattern)).cast("int")
        sess = F.sum(is_start).over(w_incl)
        df2 = df.withColumn("__mls__", sess).withColumn("__valid__", F.col("__mls__") > 0)
    elif start_pattern:
        return merge_multiline(
            df, line_col, file_col, offset_col, start_pattern,
            unmatched=unmatched, merged_col=merged_col,
        )
    elif continue_pattern and end_pattern:
        raise NotImplementedError(
            "continue+end without start is not implemented; use end_pattern "
            "alone (a continue-matching line before the end already extends "
            "the block in that mode)"
        )
    else:
        raise ValueError("need at least one of start/continue/end pattern")

    valid = df2.filter(F.col("__valid__"))
    blocks = (
        valid.groupBy(file_col, "__mls__")
        .agg(
            F.min(offset_col).alias(offset_col),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col(offset_col).alias("o"), F.col(line_col).alias("l"))
                        )
                    ),
                    lambda s: s["l"],
                ),
                "\n",
            ).alias(merged_col),
        )
        .select(file_col, offset_col, merged_col)
    )
    if unmatched == UNMATCH_DISCARD:
        return blocks
    singles = df2.filter(~F.col("__valid__")).select(
        file_col, F.col(offset_col), F.col(line_col).alias(merged_col)
    )
    return blocks.unionByName(singles)
