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
    runtimes mark partial chunks; a block ends at the first non-partial row
    (inclusive — its content is the block's tail, MergeLogsByFlag
    ProcessorMergeMultilineLogNative.cpp:113-158). Session id = running
    count of COMPLETED blocks before this row. Merge semantics follow
    MergeEvents (:insertLineBreak=false): chunks concatenate with NO
    separator, the merged event keeps the FIRST event's other fields, and
    the partial-flag field is deleted from the output."""
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
    others = [
        c
        for c in df.columns
        if c not in (file_col, offset_col, line_col, partial_flag_col, merged_col)
    ]
    aggs = [
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
    ]
    if others:
        # the merged event is the FIRST event of the block (MergeEvents
        # keeps logEvents[0] and only rewrites its SourceKey content)
        aggs.append(
            F.min_by(
                F.struct(*[F.col(c).alias(c) for c in others]), F.col(offset_col)
            ).alias("__first__")
        )
    out = tagged.groupBy(file_col, "__mls__").agg(*aggs).drop("__mls__")
    if others:
        out = out.select(
            file_col, offset_col, merged_col, *[F.col(f"__first__.{c}").alias(c) for c in others]
        )
    return out


def _assemble_blocks(
    tagged: DataFrame,
    line_col: str,
    file_col: str,
    offset_col: str,
    merged_col: str,
    unmatched: str,
    keep_cols: tuple = (),
) -> DataFrame:
    """Shared emission stage for every rule mode.

    ``keep_cols``: extra input columns to carry through — a merged block
    keeps the FIRST line's values (MergeEvents keeps logEvents[0],
    ProcessorMergeMultilineLogNative.cpp MergeEvents), while unmatched
    replay and singles keep each line's OWN values (HandleUnmatchLogs
    re-emits the original events untouched).

    ``tagged`` must carry three boolean/int helper columns:

    - ``__in_block__``  — the line belongs to some block (session);
    - ``__mls__``       — session id (meaningful where ``__in_block__``);
    - ``__matched__``   — per-LINE matched marker; a block is emitted as
      one merged event iff ``bool_or(__matched__)`` over its lines (the
      reference's CreateNewEvent vs HandleUnmatchLogs split). For modes
      where every block is matched (no end pattern) pass a literal True.

    Lines outside blocks with ``__matched__`` true are emitted as
    single-line MATCHED events (continue+end standalone end-match,
    ProcessorSplitMultilineLogStringNative.cpp:189-194) regardless of the
    ``unmatched`` treatment; other non-block lines and the lines of
    non-matched blocks follow HandleUnmatchLogs (.cpp:343-383): one event
    per line when 'single_line', dropped when 'discard'."""
    keep = [
        c for c in keep_cols
        if c not in (file_col, offset_col, line_col, merged_col)
    ]
    ev_fields = [
        F.col(offset_col).cast("long").alias("o"),
        F.col(line_col).alias("l"),
    ] + [F.col(c).alias(c) for c in keep]
    grouped = (
        tagged.filter(F.col("__in_block__"))
        .groupBy(file_col, "__mls__")
        .agg(
            F.min(offset_col).alias("__head_off__"),
            F.max(F.col("__matched__").cast("boolean")).alias("__ok__"),
            # o leads the struct and is unique per file, so array_sort
            # orders by offset regardless of the trailing fields
            F.array_sort(F.collect_list(F.struct(*ev_fields))).alias(
                "__lines__"
            ),
        )
    )
    emit_singles = F.lit(unmatched == UNMATCH_SINGLE_LINE)
    merged_struct = F.struct(
        F.col("__head_off__").cast("long").alias("o"),
        F.array_join(F.transform("__lines__", lambda s: s["l"]), "\n").alias("l"),
        # the merged event is the block's FIRST event (MergeEvents)
        *[F.element_at("__lines__", 1)[c].alias(c) for c in keep],
    )
    blocks = (
        grouped.select(
            file_col,
            F.explode(
                F.when(F.col("__ok__"), F.array(merged_struct)).otherwise(
                    # un-matched block (unterminated / closed by a non-end
                    # line): HandleUnmatchLogs replays it line by line,
                    # each event keeping its own fields
                    F.when(emit_singles, F.col("__lines__")).otherwise(
                        # empty array of the SAME element type
                        F.slice(F.col("__lines__"), 1, 0)
                    )
                )
            ).alias("__ev__"),
        )
        .select(
            file_col,
            F.col("__ev__.o").cast("long").alias(offset_col),
            F.col("__ev__.l").alias(merged_col),
            *[F.col(f"__ev__.{c}").alias(c) for c in keep],
        )
    )
    loose = tagged.filter(~F.col("__in_block__"))
    if unmatched == UNMATCH_DISCARD:
        loose = loose.filter(F.col("__matched__"))
    singles = loose.select(
        file_col,
        F.col(offset_col).cast("long").alias(offset_col),
        F.col(line_col).alias(merged_col),
        *[F.col(c) for c in keep],
    )
    return blocks.unionByName(singles)


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
    keep_fields: bool = False,
) -> DataFrame:
    """The reference's full multiline rule set, reference-exact.

    ``keep_fields=True`` carries every other input column through: merged
    blocks keep the FIRST line's values (MergeEvents keeps logEvents[0]),
    unmatched replay keeps each line's own — needed when the merge runs
    AFTER a parser (the container chain's _time_/_source_); default False
    keeps the historical (file, offset, merged) projection.

    Semantics follow the C++ state machine in
    ``ProcessorSplitMultilineLogStringNative.cpp:167-310`` plus the config
    normalization in ``MultilineOptions.cpp:125-151``:

    - **start only** — a start-match OPENS a block; everything until the
      next start-match is absorbed; leading lines are unmatched; the
      trailing block is emitted (no end pattern to wait for).
    - **start + continue** — a block is a start-match followed by the run
      of continue-matches; the first line matching neither flushes the
      block and is itself unmatched (or opens a new block if it matches
      start); trailing open block is emitted (.cpp:253-283).
    - **start + end** — a block spans start-match .. end-match inclusive;
      while a block is open ONLY the end pattern is consulted, so nested
      start-matches are absorbed (.cpp:231-250); an unterminated trailing
      block goes through HandleUnmatchLogs (.cpp:295-308), NOT merged
      emission; lines outside blocks are unmatched.
    - **end only** — every line belongs to a block closed by an
      end-match (isPartialLog sticks on, .cpp:166-170); lines after the
      last end-match are unmatched (.cpp:295-308).
    - **continue + end** — a block is a maximal run of continue-matches
      plus ONE closing line: if that closer matches end the block is
      emitted merged (closer included); otherwise the whole run and the
      closer are unmatched line-by-line (.cpp:218-230). A standalone
      end-match (not preceded by a continue-match) is a matched
      single-line event (.cpp:189-194); other standalone lines are
      unmatched. A trailing run with no closer is unmatched.
    - **continue only** — the reference IGNORES the multiline config
      entirely ("param Multiline.StartPattern and EndPattern are empty
      but ContinuePattern is not: ignore multiline config",
      MultilineOptions.cpp:125-138; the split processor is only inserted
      when IsMultiline(), InputFile.cpp:217): every line stays its own
      event. We warn and return the identity projection.
    - **start + continue + end** — the reference drops ContinuePattern
      with a warning (MultilineOptions.cpp:139-151) → start + end.

    All modes are window passes + one groupBy on (file, session) — the
    same single shuffle shape; at scale the input should already be
    partitioned by file so AQE keeps it local.

    ``unmatched`` = 'single_line' (each unmatched line its own event) or
    'discard' (UnmatchedContentTreatment, MultilineOptions.h:32)."""
    import warnings

    merged_col = merged_col or line_col
    line = F.col(line_col)
    w_ord = Window.partitionBy(file_col).orderBy(offset_col)
    w_incl = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_excl = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    w_all = w_ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    if start_pattern and continue_pattern and end_pattern:
        warnings.warn(
            "Start+Continue+End all set: ContinuePattern ignored "
            "(MultilineOptions.cpp:139-151)", stacklevel=2,
        )
        continue_pattern = None

    if continue_pattern and not start_pattern and not end_pattern:
        warnings.warn(
            "ContinuePattern without Start/End: multiline config ignored "
            "(MultilineOptions.cpp:125-138)", stacklevel=2,
        )
        return df.select(
            file_col,
            F.col(offset_col).cast("long").alias(offset_col),
            F.col(line_col).alias(merged_col),
        )

    if start_pattern and end_pattern:
        # Open/close automaton. Lines matching BOTH patterns toggle the
        # state (outside: start-check opens, .cpp:180-183; inside: the
        # end-check closes, .cpp:231-238), so the in-block state before
        # row i is (last pure start/end symbol) XOR (parity of
        # both-matching lines since it).
        p = line.rlike(start_pattern)
        q = line.rlike(end_pattern)
        t0 = (
            df.withColumn("__p__", p)
            .withColumn("__q__", q)
            .withColumn("__pb__", p & q)
        )
        t1 = t0.withColumn("__cb__", F.sum(F.col("__pb__").cast("int")).over(w_incl))
        pure = (F.col("__p__") | F.col("__q__")) & ~F.col("__pb__")
        t2 = (
            t1.withColumn(
                "__lsym__",
                F.last(F.when(pure, F.col("__p__").cast("int")), ignorenulls=True).over(w_excl),
            )
            .withColumn(
                "__lcb__",
                F.last(F.when(pure, F.col("__cb__")), ignorenulls=True).over(w_excl),
            )
            .withColumn(
                "__cbx__",
                F.coalesce(F.sum(F.col("__pb__").cast("int")).over(w_excl), F.lit(0)),
            )
        )
        state = (
            F.coalesce(F.col("__lsym__"), F.lit(0))
            + (F.col("__cbx__") - F.coalesce(F.col("__lcb__"), F.lit(0))) % 2
        ) % 2
        t3 = t2.withColumn("__open__", state == 1)
        head = F.col("__p__") & ~F.col("__open__")
        t4 = (
            t3.withColumn("__head__", head)
            .withColumn("__close__", F.col("__q__") & F.col("__open__"))
            .withColumn("__in_block__", head | F.col("__open__"))
        )
        tagged = t4.withColumn(
            "__mls__", F.sum(F.col("__head__").cast("int")).over(w_incl)
        ).withColumn("__matched__", F.col("__close__"))
    elif end_pattern and not continue_pattern:
        # end-only: isPartialLog from the first line; a block closes at
        # each end-match; trailing lines after the last end-match are
        # unmatched (HandleUnmatchLogs at EOF, .cpp:295-308).
        e = line.rlike(end_pattern).cast("int")
        t0 = df.withColumn("__e__", e)
        tagged = (
            t0.withColumn(
                "__mls__",
                F.coalesce(F.sum("__e__").over(w_excl), F.lit(0)) + 1,
            )
            .withColumn("__tot__", F.sum("__e__").over(w_all))
            .withColumn("__in_block__", F.col("__mls__") <= F.col("__tot__"))
            .withColumn("__matched__", F.col("__in_block__"))
        )
    elif continue_pattern and end_pattern:
        # continue+end: state_before(i) == line i-1 matched continue.
        # Blocks = run of continue-matches + one closer line; matched iff
        # the closer matches end. Standalone end-match = matched single.
        c = line.rlike(continue_pattern)
        e = line.rlike(end_pattern)
        t0 = df.withColumn("__c__", c).withColumn("__e__", e)
        t1 = t0.withColumn(
            "__open__", F.coalesce(F.lag("__c__").over(w_ord), F.lit(False))
        )
        head = F.col("__c__") & ~F.col("__open__")
        t2 = t1.withColumn("__head__", head).withColumn(
            "__in_block__", F.col("__c__") | F.col("__open__")
        )
        tagged = t2.withColumn(
            "__mls__", F.sum(F.col("__head__").cast("int")).over(w_incl)
        ).withColumn(
            # inside a run: only the closer (non-continue) line can match
            # the block; outside: an end-match emits as a matched single
            "__matched__",
            F.when(F.col("__in_block__"), ~F.col("__c__") & F.col("__e__"))
            .otherwise(F.col("__e__")),
        )
    elif start_pattern and continue_pattern:
        # start+continue: in_block(i) = start(i) OR (cont(i) AND
        # in_block(i-1)); closed form: a start-match at or after the last
        # non-continue line (.cpp:198-205,253-283). A start absorbed by an
        # open run (matches continue too) does NOT split the block
        # (continue is checked first, .cpp:207-211).
        s = line.rlike(start_pattern)
        c = line.rlike(continue_pattern)
        t0 = df.withColumn("__s__", s).withColumn("__c__", c)
        off = F.col(offset_col)
        t1 = (
            t0.withColumn("__ln__", F.max(F.when(~F.col("__c__"), off)).over(w_incl))
            .withColumn("__ls__", F.max(F.when(F.col("__s__"), off)).over(w_incl))
            .withColumn("__lnx__", F.max(F.when(~F.col("__c__"), off)).over(w_excl))
            .withColumn("__lsx__", F.max(F.when(F.col("__s__"), off)).over(w_excl))
        )
        in_block = F.col("__ls__").isNotNull() & (
            F.col("__ln__").isNull() | (F.col("__ls__") >= F.col("__ln__"))
        )
        in_block_prev = F.col("__lsx__").isNotNull() & (
            F.col("__lnx__").isNull() | (F.col("__lsx__") >= F.col("__lnx__"))
        )
        t2 = t1.withColumn("__in_block__", in_block).withColumn(
            "__head__", F.col("__s__") & (~F.col("__c__") | ~in_block_prev)
        )
        tagged = t2.withColumn(
            "__mls__", F.sum(F.col("__head__").cast("int")).over(w_incl)
        ).withColumn("__matched__", F.col("__in_block__"))
    elif start_pattern:
        if not keep_fields:
            return merge_multiline(
                df, line_col, file_col, offset_col, start_pattern,
                unmatched=unmatched, merged_col=merged_col,
            )
        # start-only through the shared assembler so keep_fields applies:
        # a start-match opens a block, everything else absorbs, every block
        # is matched (no end pattern to wait for); leading lines unmatched
        s = line.rlike(start_pattern).cast("int")
        t0 = df.withColumn("__s__", s)
        tagged = (
            t0.withColumn("__mls__", F.sum("__s__").over(w_incl))
            .withColumn("__in_block__", F.col("__mls__") > 0)
            .withColumn("__matched__", F.col("__mls__") > 0)
        )
    else:
        raise ValueError("need at least one of start/continue/end pattern")

    keep_cols = (
        tuple(c for c in df.columns if c not in (file_col, offset_col, line_col))
        if keep_fields
        else ()
    )
    return _assemble_blocks(
        tagged, line_col, file_col, offset_col, merged_col, unmatched,
        keep_cols=keep_cols,
    )
