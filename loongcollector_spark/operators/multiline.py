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
