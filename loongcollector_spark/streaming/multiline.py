"""Stateful streaming multiline merge — blocks that straddle micro-batches.

The reference's multiline processor keeps the current accumulating entry as
state between reads (ProcessorMergeMultilineLogNative.h:26-51; a block is
only emitted when the NEXT start line arrives or a flush timeout fires).
Batch mode handles this with window sessionization (operators/multiline.py);
in streaming, a block's head may arrive in one micro-batch and its tail in
the next, so the pending block must live in GroupState keyed by file.

Semantics (BY_REGEX, start-pattern mode):
- lines are processed per file in offset order within each micro-batch;
- a line matching ``start_pattern`` closes and emits the pending block and
  opens a new one; other lines append to the pending block;
- lines before any start line (e.g. the head of a resumed file) are emitted
  as single-line blocks (UNMATCH_SINGLE_LINE);
- on group-state timeout (no new lines for ``flush_timeout_ms``), the
  pending block is flushed — the Batcher timeout-flush analogue.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "head_offset long, lines array<string>"
OUT_SCHEMA_SUFFIX = "file string, offset long, block string"


def streaming_merge_multiline(
    df: DataFrame,
    line_col: str,
    file_col: str,
    offset_col: str,
    start_pattern: str,
    flush_timeout_ms: int = 60_000,
    unmatched: str = "single_line",
) -> DataFrame:
    """Merge a streaming line feed into multiline blocks with cross-batch
    state. Output schema: (file, offset of block head, block text).
    ``unmatched`` follows the batch operator's UnmatchedContentTreatment:
    head-of-stream lines arriving before any start-match are emitted as
    single-line events ('single_line') or dropped ('discard')."""
    import re

    compiled = re.compile(start_pattern)

    def merge(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        file_id = key[0]
        if state.hasTimedOut:
            if state.exists:
                head, lines = state.get
                state.remove()
                yield pd.DataFrame(
                    {"file": [file_id], "offset": [head], "block": ["\n".join(lines)]}
                )
            return

        if state.exists:
            head, lines = state.get
            pending: Tuple[int, list] | None = (head, list(lines))
        else:
            pending = None

        out_files: list = []
        out_offsets: list = []
        out_blocks: list = []

        def emit(p: Tuple[int, list]) -> None:
            out_files.append(file_id)
            out_offsets.append(p[0])
            out_blocks.append("\n".join(p[1]))

        # applyInPandasWithState splits a group into multiple Arrow chunks
        # beyond arrow.maxRecordsPerBatch, and cross-chunk order after the
        # shuffle is arbitrary — materialize the whole group and sort ONCE so
        # >10k-line files still merge in offset order.
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(offset_col)
            for off, line in zip(pdf[offset_col], pdf[line_col]):
                if compiled.search(line):
                    if pending is not None:
                        emit(pending)
                    pending = (int(off), [line])
                elif pending is None:
                    # head-of-stream continuation line: unmatched path
                    if unmatched != "discard":
                        emit((int(off), [line]))
                else:
                    pending[1].append(line)

        if pending is not None:
            state.update((int(pending[0]), [str(l) for l in pending[1]]))
            state.setTimeoutDuration(flush_timeout_ms)
        elif state.exists:
            state.remove()

        if out_files:
            yield pd.DataFrame(
                {"file": out_files, "offset": out_offsets, "block": out_blocks}
            )

    return df.groupBy(file_col).applyInPandasWithState(
        merge,
        outputStructType=OUT_SCHEMA_SUFFIX,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def streaming_merge_by_flag(
    df: DataFrame,
    line_col: str,
    file_col: str,
    offset_col: str,
    partial_flag_col: str,
    flush_timeout_ms: int = 60_000,
) -> DataFrame:
    """Stateful BY_FLAG merge — the streaming twin of
    operators.multiline.merge_by_flag (MergeLogsByFlag,
    ProcessorMergeMultilineLogNative.cpp:113-158): partial-flagged chunks
    accumulate per file across micro-batches; the first non-partial chunk
    closes the block (its content included), concatenated with NO separator;
    the merged event keeps the FIRST chunk's other fields and drops the
    flag. A pending block with no closing chunk flushes on the group-state
    timeout — the reference flushes it at group end.

    Output schema: (file, offset of block head, merged line_col, *other
    input columns from the first chunk) — the extra columns (container
    ``_time_``/``_source_`` etc.) ride through, as MergeEvents keeps
    logEvents[0] intact and only rewrites its SourceKey content."""
    from pyspark.sql.types import ArrayType, StringType, StructType

    in_schema = df.schema
    others = [
        f
        for f in in_schema.fields
        if f.name not in (file_col, offset_col, line_col, partial_flag_col)
    ]
    out_schema = StructType()
    out_schema.add("file", in_schema[file_col].dataType)
    out_schema.add("offset", "long")
    out_schema.add(line_col, in_schema[line_col].dataType)
    for f in others:
        out_schema.add(f)
    state_schema = StructType()
    state_schema.add("head_offset", "long")
    state_schema.add("chunks", ArrayType(StringType()))
    for f in others:
        state_schema.add(f)
    other_names = [f.name for f in others]

    def merge(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        file_id = key[0]

        def block_frame(rows: list) -> pd.DataFrame:
            cols: dict = {"file": [], "offset": [], line_col: []}
            for n in other_names:
                cols[n] = []
            for head, chunks, firsts in rows:
                cols["file"].append(file_id)
                cols["offset"].append(head)
                cols[line_col].append("".join(chunks))
                for n, v in zip(other_names, firsts):
                    cols[n].append(v)
            return pd.DataFrame(cols)

        if state.hasTimedOut:
            if state.exists:
                head, chunks, *firsts = state.get
                state.remove()
                yield block_frame([(head, list(chunks), firsts)])
            return

        pending: tuple | None = None
        if state.exists:
            head, chunks, *firsts = state.get
            pending = (head, list(chunks), list(firsts))

        out_rows: list = []
        chunk_frames = [p for p in pdfs if len(p)]
        if chunk_frames:
            pdf = (
                pd.concat(chunk_frames)
                if len(chunk_frames) > 1
                else chunk_frames[0]
            )
            pdf = pdf.sort_values(offset_col)
            firsts_cols = [pdf[n] for n in other_names]

            def _py(v):  # numpy scalar → plain python for GroupState.update
                return v.item() if hasattr(v, "item") else v

            for i, (off, line, is_partial) in enumerate(
                zip(pdf[offset_col], pdf[line_col], pdf[partial_flag_col])
            ):
                row_firsts = [_py(c.iloc[i]) for c in firsts_cols]
                line = "" if line is None else str(line)
                if pending is None:
                    if is_partial:
                        pending = (int(off), [line], row_firsts)
                    else:
                        out_rows.append((int(off), [line], row_firsts))
                else:
                    pending[1].append(line)
                    if not is_partial:
                        out_rows.append(pending)
                        pending = None

        if pending is not None:
            state.update(
                (int(pending[0]), [str(c) for c in pending[1]], *pending[2])
            )
            state.setTimeoutDuration(flush_timeout_ms)
        elif state.exists:
            state.remove()

        if out_rows:
            yield block_frame(out_rows)

    return df.groupBy(file_col).applyInPandasWithState(
        merge,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
