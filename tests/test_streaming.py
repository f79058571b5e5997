"""Streaming pipeline tests: file-source micro-batches through the same
processor chain + router, checkpoint-resume, and the stateful token bucket.

Mirrors the reference's e2e pattern (test/e2e/test_cases/: boot env, apply a
pipeline config, generate input, assert per-sink counts/fields)."""

from __future__ import annotations

import pandas as pd
import pytest

from loongcollector_spark.operators.route import Condition, Route
from loongcollector_spark.pipeline import PipelineSpec
from loongcollector_spark.sources import generate_sequences, render_lines
from loongcollector_spark.streaming import run_streaming_pipeline, streaming_rate_limit

SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string, line string"


@pytest.fixture(scope="module")
def stream_input(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("stream_in"))
    rendered = render_lines(generate_sequences(spark, 2000, partitions=4))
    rendered.write.mode("overwrite").parquet(base)
    return base


def _spec() -> PipelineSpec:
    return PipelineSpec(
        name="stream",
        processors=[
            ("parse_json", {"source_key": "line", "keys": ["method", "status", "level"],
                            "options": {"keep_source_on_fail": True,
                                        "keep_source_on_success": True}}),
            ("dict_map", {"source_key": "source",
                          "mapping": {"web-01": "edge", "app-01": "svc"},
                          "dest_key": "tier", "missing": "other"}),
        ],
        routes=[
            Route("web", Condition(content_key="source", content_regex="web-.*")),
            Route("app", Condition(content_key="source", content_regex="app-.*")),
        ],
        shard_keys=("source", "doc_id"),
        shard_count=8,
    )


def test_streaming_matches_batch(spark, stream_input, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    res = run_streaming_pipeline(
        spark, stream_input, SCHEMA, _spec(), out, ckpt, available_now=True
    )
    assert not res["active"]
    assert set(res["sinks"]) == {"web", "app", "default"}

    batch = spark.read.parquet(stream_input)
    for sink, fam in [("web", "web"), ("app", "app")]:
        got = spark.read.parquet(f"{out}/{sink}")
        expect = batch.filter(batch.source.startswith(fam)).count()
        assert got.count() == expect
        assert "tier" in got.columns and "__bucket__" in got.columns
    # default sink gets the sys-* family
    got_default = spark.read.parquet(f"{out}/default").count()
    assert got_default == batch.filter(batch.source.startswith("sys")).count()


def test_streaming_resume_no_duplicates(spark, stream_input, tmp_path):
    """Restarting with the same checkpoint reprocesses nothing (offset commit
    semantics of the reference's file checkpoints)."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_streaming_pipeline(spark, stream_input, SCHEMA, _spec(), out, ckpt)
    first = spark.read.parquet(f"{out}/web").count()
    run_streaming_pipeline(spark, stream_input, SCHEMA, _spec(), out, ckpt)
    assert spark.read.parquet(f"{out}/web").count() == first


def test_streaming_rate_limit_token_bucket(spark, tmp_path):
    """Per-key bucket: burst of 3 at t=0 passes 3; after a 2s gap at rate
    3/s the bucket refills fully, passing 3 more."""
    rows = [
        {"k": key, "ts": float(t), "n": i}
        for key in ("a", "b")
        for i, t in enumerate([0.0, 0.0, 0.0, 0.1, 0.2, 5.0, 5.0, 5.0, 5.1])
    ]
    src = tmp_path / "rl_in"
    src.mkdir()
    pd.DataFrame(rows).to_parquet(str(src / "p.parquet"))
    src = str(src)
    stream = (
        spark.readStream.format("parquet")
        .schema("k string, ts double, n long")
        .load(src)
    )
    limited = streaming_rate_limit(stream, ["k"], "3/s", ts_col="ts")
    out = str(tmp_path / "rl_out")
    q = (
        limited.writeStream.format("parquet")
        .option("checkpointLocation", str(tmp_path / "rl_ckpt"))
        .option("path", out)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out).toPandas()
    # per key: 3 pass at t≈0 (burst), bucket empty until refill; at t=5 the
    # bucket is full again (capped at burst=3) → 3 more pass = 6 per key
    assert sorted(got.groupby("k").size().to_dict().items()) == [("a", 6), ("b", 6)]
