"""log_tail streaming data source — LogFileReader semantics e2e.

Mirrors the reference reader e2e suite (test/e2e/test_cases/):
reader_new_line_after_timeout (appended lines re-collected from the
recorded byte offset — the case the whole-file stream cannot express),
reader_log_rotate (rotation tracked by dev:inode, no loss / no dup),
reader_flush_timeout (a never-terminated final line flushes after the
read timeout; later bytes form a NEW event), reader_deleted (a deleted
file neither errors nor re-delivers), plus the copytruncate regression
reset and the Hadoop-split chunk-ownership rule at tiny
max_partition_bytes (core/file_server/reader/LogFileReader.h semantics).
"""

from __future__ import annotations

import os

import pytest

from loongcollector_spark.sources.files import PATH_TAG
from loongcollector_spark.sources.tail import (
    LogTailStreamReader,
    _newline_boundary,
    tail_log_files,
)


def _drain(spark, pattern, out, ckpt, **opts):
    opts.setdefault("flush_timeout_ms", 0)
    df = tail_log_files(spark, pattern, **opts)
    from loongcollector_spark.streaming.pipeline import drain_available_now

    q = (
        df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    drain_available_now(q, 120)


def _events(spark, out):
    try:
        rows = spark.read.parquet(out).collect()
    except Exception:
        return []
    return sorted(
        (os.path.basename(r[PATH_TAG]), r["__offset__"], r["content"])
        for r in rows
    )


def test_tail_appended_lines_resume(spark, tmp_path):
    """reader_new_line_after_timeout: lines appended to an ALREADY-READ file
    are collected from the checkpointed byte offset — no loss, no re-read."""
    logs = tmp_path / "logs"
    logs.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    live = logs / "app.log"
    live.write_text("l1\nl2\n")
    _drain(spark, str(logs / "app.log*"), out, ckpt)
    assert _events(spark, out) == [("app.log", 0, "l1"), ("app.log", 3, "l2")]

    with live.open("a") as f:
        f.write("l3\n")
    _drain(spark, str(logs / "app.log*"), out, ckpt)
    assert _events(spark, out) == [
        ("app.log", 0, "l1"),
        ("app.log", 3, "l2"),
        ("app.log", 6, "l3"),
    ]


def test_tail_rotation_by_inode(spark, tmp_path):
    """reader_log_rotate: logrotate renames the live file; the rotated
    generation finishes from its recorded offset under its NEW name while
    the fresh live file starts at 0 — dev:inode is the identity, not the
    path (LogFileReader tracks the fd across renames)."""
    logs = tmp_path / "logs"
    logs.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    live = logs / "app.log"
    live.write_text("gen1-a\n")
    _drain(spark, str(logs / "app.log*"), out, ckpt)

    # appended-then-rotated bytes must be read exactly once, post-rename
    with live.open("a") as f:
        f.write("gen1-b\n")
    live.rename(logs / "app.log.1")
    live.write_text("gen2-a\n")
    _drain(spark, str(logs / "app.log*"), out, ckpt)
    assert _events(spark, out) == [
        ("app.log", 0, "gen1-a"),
        ("app.log", 0, "gen2-a"),
        ("app.log.1", 7, "gen1-b"),
    ]


def test_tail_flush_timeout_and_remainder(spark, tmp_path):
    """reader_flush_timeout: with the timeout elapsed (0 here) an
    unterminated final line flushes as an event; bytes completing it later
    form a NEW event — the reference also commits the offset on flush."""
    logs = tmp_path / "logs"
    logs.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    live = logs / "a.log"
    live.write_text("done\npending-part")
    _drain(spark, str(logs / "*.log"), out, ckpt)
    assert _events(spark, out) == [
        ("a.log", 0, "done"),
        ("a.log", 5, "pending-part"),
    ]

    with live.open("a") as f:
        f.write("ial-rest\nnext\n")
    _drain(spark, str(logs / "*.log"), out, ckpt)
    assert _events(spark, out) == [
        ("a.log", 0, "done"),
        ("a.log", 5, "pending-part"),
        ("a.log", 17, "ial-rest"),
        ("a.log", 26, "next"),
    ]


def test_tail_unflushed_partial_waits(spark, tmp_path):
    """Before the read timeout fires, bytes past the last newline stay
    pending (the reference buffers them in the reader) — only terminated
    lines are delivered."""
    logs = tmp_path / "logs"
    logs.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    (logs / "a.log").write_text("done\npending")
    # freshly written ⇒ mtime is now ⇒ a 1-hour timeout never fires
    _drain(spark, str(logs / "*.log"), out, ckpt, flush_timeout_ms=3_600_000)
    assert _events(spark, out) == [("a.log", 0, "done")]


def test_tail_deleted_file(spark, tmp_path):
    """reader_deleted: deleting a collected file is not an error and never
    re-delivers its rows; sibling files keep flowing."""
    logs = tmp_path / "logs"
    logs.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    (logs / "a.log").write_text("a1\n")
    (logs / "b.log").write_text("b1\n")
    _drain(spark, str(logs / "*.log"), out, ckpt)
    (logs / "a.log").unlink()
    with (logs / "b.log").open("a") as f:
        f.write("b2\n")
    _drain(spark, str(logs / "*.log"), out, ckpt)
    assert _events(spark, out) == [
        ("a.log", 0, "a1"),
        ("b.log", 0, "b1"),
        ("b.log", 3, "b2"),
    ]


def test_tail_copytruncate_resets(spark, tmp_path):
    """logrotate copytruncate: the file shrinks in place (same inode) — a
    size regression below the recorded offset re-reads from 0, as the
    reference does when the file it tracks is truncated."""
    logs = tmp_path / "logs"
    logs.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    live = logs / "a.log"
    live.write_text("old-1\nold-2\n")
    _drain(spark, str(logs / "*.log"), out, ckpt)
    live.write_text("new\n")  # truncate + rewrite, inode unchanged
    _drain(spark, str(logs / "*.log"), out, ckpt)
    assert _events(spark, out) == [
        ("a.log", 0, "new"),
        ("a.log", 0, "old-1"),
        ("a.log", 6, "old-2"),
    ]


def test_tail_chunked_partitions_exact(spark, tmp_path):
    """max_partition_bytes far below the file size: the Hadoop split rule
    (a chunk owns lines STARTING inside it, reads past its end to finish
    the last one) must deliver every line exactly once with exact byte
    offsets — including lines longer than a whole chunk."""
    logs = tmp_path / "logs"
    logs.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    lines = [f"line-{i:04d}-" + "x" * (i % 37) for i in range(200)]
    lines[50] = "L" * 300  # spans many 64-byte chunks
    (logs / "a.log").write_text("\n".join(lines) + "\n")
    _drain(spark, str(logs / "*.log"), out, ckpt, max_partition_bytes=64)
    got = _events(spark, out)
    offsets, expected_off = [], 0
    for ln in lines:
        offsets.append(expected_off)
        expected_off += len(ln) + 1
    assert got == sorted(
        ("a.log", off, ln) for off, ln in zip(offsets, lines)
    )


def test_tail_start_at_end_skips_history(spark, tmp_path):
    """start_at='end' mirrors the reference's tail-from-now startup: bytes
    present before the query starts are skipped, later appends collect."""
    logs = tmp_path / "logs"
    logs.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    live = logs / "a.log"
    live.write_text("history-1\nhistory-2\n")
    _drain(spark, str(logs / "*.log"), out, ckpt, start_at="end")
    assert _events(spark, out) == []
    with live.open("a") as f:
        f.write("fresh\n")
    _drain(spark, str(logs / "*.log"), out, ckpt, start_at="end")
    assert _events(spark, out) == [("a.log", 20, "fresh")]


def test_tail_native_runner_e2e(spark, tmp_path):
    """run_native_streaming(tail=True): an unmodified reference YAML runs
    over a live directory with regex parse, collecting appended lines
    across checkpointed runs — the full collector loop on the tail source."""
    import yaml

    from loongcollector_spark.streaming.pipeline import run_native_streaming

    logs = tmp_path / "logs"
    logs.mkdir()
    out = str(tmp_path / "out")
    cfg = tmp_path / "tail.yaml"
    cfg.write_text(
        yaml.safe_dump(
            {
                "inputs": [
                    {"Type": "input_file", "FilePaths": [str(logs / "*.log")]}
                ],
                "processors": [
                    {
                        "Type": "processor_parse_regex_native",
                        "SourceKey": "content",
                        "Regex": r"(\w+) (\d+)",
                        "Keys": ["word", "num"],
                    }
                ],
                "flushers": [{"Type": "flusher_file", "FilePath": out}],
            }
        )
    )

    def run():
        return run_native_streaming(
            spark,
            str(cfg),
            str(logs / "*.log"),
            str(tmp_path / "fanout"),
            str(tmp_path / "ckpt"),
            sink_overrides={"file": {"format": "parquet", "path": out}},
            tail=True,
            flush_timeout_ms=0,
            timeout_sec=120.0,
        )

    live = logs / "app.log"
    live.write_text("alpha 1\n")
    run()
    with live.open("a") as f:
        f.write("beta 2\n")
    run()
    got = sorted((r.word, r.num) for r in spark.read.parquet(out).collect())
    assert got == [("alpha", "1"), ("beta", "2")]


# -- pure-function units (no Spark) ---------------------------------------


def test_newline_boundary_blocks(tmp_path):
    p = tmp_path / "f"
    p.write_bytes(b"a\n" + b"x" * 200_000)  # newline beyond one scan block
    assert _newline_boundary(str(p), p.stat().st_size) == 2
    p.write_bytes(b"x" * 100)  # no newline at all
    assert _newline_boundary(str(p), 100) == 0
    p.write_bytes(b"")
    assert _newline_boundary(str(p), 0) == 0


def test_partitions_plan_chunks_and_truncate():
    r = LogTailStreamReader({"path": "/x/*.log", "max_partition_bytes": 10})
    start = {"files": {"1:1": {"path": "/x/a.log", "pos": 5}}}
    end = {
        "files": {
            "1:1": {"path": "/x/a.log", "pos": 31},   # grew: 5 → 31
            "1:2": {"path": "/x/b.log", "pos": 4},    # new file
            "1:3": {"path": "/x/c.log", "pos": 4},    # unchanged — no part
        }
    }
    start["files"]["1:3"] = {"path": "/x/c.log", "pos": 4}
    parts = r.partitions(start, end)
    got = sorted((p.key, p.chunk_start, p.chunk_end, p.range_start, p.range_end) for p in parts)
    assert got == [
        ("1:1", 5, 15, 5, 31),
        ("1:1", 15, 25, 5, 31),
        ("1:1", 25, 31, 5, 31),
        ("1:2", 0, 4, 0, 4),
    ]
    # copytruncate: pos regressed below start → re-plan from 0
    shrunk = {"files": {"1:1": {"path": "/x/a.log", "pos": 3}}}
    (p,) = r.partitions(start, shrunk)
    assert (p.chunk_start, p.chunk_end, p.range_start) == (0, 3, 0)


def test_reader_rejects_bad_options():
    with pytest.raises(ValueError):
        LogTailStreamReader({})
    with pytest.raises(ValueError):
        LogTailStreamReader({"path": "/x", "max_partition_bytes": 0})
    with pytest.raises(ValueError):
        LogTailStreamReader({"path": "/x", "start_at": "middle"})


def test_inode_reuse_signature_resets_offset(tmp_path):
    """A brand-new file that recycles a dead generation's inode must NOT
    inherit its byte offset: the head-signature check (the reference's
    mLastFileSignatureHash/Size) detects the different first bytes and
    plans the range from 0. Driven at the partitions() level because real
    inode recycling can't be forced portably."""
    p = tmp_path / "a.log"
    p.write_bytes(b"new generation first line\nsecond\n")
    reader = LogTailStreamReader({"path": str(tmp_path / "*.log")})
    end = reader.latestOffset()
    (key, ent), = end["files"].items()
    # same dev:ino key, offset 300 from the dead generation, stale signature
    start = {"files": {key: {"path": ent["path"], "pos": 10,
                             "sig": (ent["sig"] + 1) & 0xFFFFFFFF,
                             "sig_size": ent["sig_size"]}}}
    parts = reader.partitions(start, end)
    assert len(parts) == 1 and parts[0].range_start == 0
    # identical signature → same generation → offset honored
    start_ok = {"files": {key: dict(ent, pos=10)}}
    parts = reader.partitions(start_ok, end)
    assert len(parts) == 1 and parts[0].range_start == 10
    # legacy checkpoint without a signature is trusted (no spurious re-read)
    start_legacy = {"files": {key: {"path": ent["path"], "pos": 10}}}
    parts = reader.partitions(start_legacy, end)
    assert len(parts) == 1 and parts[0].range_start == 10


def test_grown_prefix_signature_still_matches(tmp_path):
    """A file first seen under 1024 bytes grows past it: the start offset's
    short signature is re-checked over the SAME prefix length against the
    grown file — a pure append must not look like a new generation."""
    p = tmp_path / "a.log"
    p.write_bytes(b"tiny first line\n")
    reader = LogTailStreamReader({"path": str(tmp_path / "*.log")})
    start = reader.latestOffset()
    (key, sent), = start["files"].items()
    assert sent["sig_size"] == 16  # short prefix: whole current file
    p.write_bytes(b"tiny first line\n" + b"x" * 2048 + b"\n")
    end = reader.latestOffset()
    ent = end["files"][key]
    assert ent["sig_size"] == 1024  # signature now spans the full prefix
    parts = reader.partitions(start, end)
    assert len(parts) == 1 and parts[0].range_start == 16
    # but a REWRITTEN head under the same inode (same short sig length on
    # the start side) re-reads from 0
    p.write_bytes(b"DIFFERENT head!!\n" + b"y" * 2048 + b"\n")
    reader._cache.clear()
    end2 = reader.latestOffset()
    parts = reader.partitions(start, end2)
    assert parts and parts[0].range_start == 0


def test_scan_survives_file_deleted_between_stat_and_open(tmp_path, monkeypatch):
    """reader_deleted: a file vanishing between os.stat and the boundary
    read must drop out of the scan, not crash latestOffset."""
    import loongcollector_spark.sources.tail as tail_mod

    a, b = tmp_path / "a.log", tmp_path / "b.log"
    a.write_bytes(b"keep\n")
    b.write_bytes(b"gone\n")
    real = tail_mod._newline_boundary

    def flaky(path, size):
        if path.endswith("b.log"):
            raise FileNotFoundError(path)
        return real(path, size)

    monkeypatch.setattr(tail_mod, "_newline_boundary", flaky)
    reader = LogTailStreamReader({"path": str(tmp_path / "*.log")})
    off = reader.latestOffset()
    assert [e["path"].endswith("a.log") for e in off["files"].values()] == [True]


def test_scan_boundary_cache_skips_unchanged_files(tmp_path, monkeypatch):
    """An unchanged (size, mtime) file costs a pure stat on later scans —
    the tail-block read happens once, not per trigger."""
    import loongcollector_spark.sources.tail as tail_mod

    p = tmp_path / "a.log"
    p.write_bytes(b"line\n" * 100)
    calls = []
    real = tail_mod._newline_boundary

    def counting(path, size):
        calls.append(path)
        return real(path, size)

    monkeypatch.setattr(tail_mod, "_newline_boundary", counting)
    reader = LogTailStreamReader({"path": str(tmp_path / "*.log")})
    reader.latestOffset()
    reader.latestOffset()
    reader.latestOffset()
    assert len(calls) == 1
    with open(p, "ab") as f:  # growth invalidates the cache entry
        f.write(b"more\n")
    reader.latestOffset()
    assert len(calls) == 2


from hypothesis import given, settings
from hypothesis import strategies as st

_line = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF,
                           exclude_characters="\n"),
    max_size=40,
)


@settings(max_examples=80, deadline=None)
@given(
    lines=st.lists(_line, max_size=30),
    terminated=st.booleans(),
    mpb=st.integers(min_value=1, max_value=97),
)
def test_tail_chunk_ownership_property(lines, terminated, mpb):
    """Hadoop-split ownership invariant, fuzzed: for ANY file content
    (empty lines, multi-byte UTF-8, unterminated tail) and ANY
    max_partition_bytes (down to 1 byte — every line spans chunks), the
    union of all partition reads is exactly the file's lines, each ONCE,
    at its exact byte offset. flush_timeout_ms=0 so the unterminated
    final line flushes immediately (the read-timeout path)."""
    import tempfile

    data = b"".join(ln.encode("utf-8") + b"\n" for ln in lines)
    if not terminated and data:
        data = data[:-1]
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "a.log")
        with open(p, "wb") as f:
            f.write(data)
        reader = LogTailStreamReader({
            "path": os.path.join(d, "*.log"),
            "flush_timeout_ms": 0,
            "max_partition_bytes": mpb,
        })
        parts = reader.partitions({"files": {}}, reader.latestOffset())
        got = []
        for part in parts:
            for batch in reader.read(part):
                got.extend(zip(batch.column(2).to_pylist(),
                               batch.column(0).to_pylist()))
    got.sort()
    expected, off = [], 0
    enc = [ln.encode("utf-8") for ln in lines]
    for i, b in enumerate(enc):
        last = i == len(enc) - 1
        if not (last and not terminated and not b):
            expected.append((off, b.decode("utf-8")))
        off += len(b) + 1
    assert got == expected


@settings(max_examples=80, deadline=None)
@given(
    data=st.binary(max_size=300),
    cut_frac=st.floats(min_value=0.0, max_value=1.0),
    mpb=st.integers(min_value=1, max_value=97),
)
def test_tail_resume_tiles_appended_bytes_exactly_once(data, cut_frac, mpb):
    """Two-scan resume invariant, fuzzed: write a prefix, scan+plan, append
    the rest, scan+plan again — the two plans tile [0, len) contiguously
    with no overlap and no gap (exactly-once over arbitrary bytes), and the
    head-signature guard never mistakes a pure append for a new generation
    (which would show as a round-2 range restarting at 0)."""
    import tempfile

    c = int(len(data) * cut_frac)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "a.log")
        with open(p, "wb") as f:
            f.write(data[:c])
        reader = LogTailStreamReader({
            "path": os.path.join(d, "*.log"),
            "flush_timeout_ms": 0,
            "max_partition_bytes": mpb,
        })
        scan1 = reader.latestOffset()
        parts1 = reader.partitions({"files": {}}, scan1)
        with open(p, "ab") as f:
            f.write(data[c:])
        scan2 = reader.latestOffset()
        parts2 = reader.partitions(scan1, scan2)
    spans = sorted(
        (pt.chunk_start, pt.chunk_end) for pt in list(parts1) + list(parts2)
    )
    pos = 0
    for s, e in spans:
        assert s == pos and e > s, (spans, c, len(data))
        pos = e
    assert pos == len(data), (spans, c, len(data))
