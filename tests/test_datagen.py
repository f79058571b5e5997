"""Synthetic tokenized-sequence table: determinism + per-row token oracle.

Mirrors the reference's deterministic mock-input strategy
(plugins/input/mock/, test/e2e/test_cases/input_mock_log/case.feature)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from loongcollector_spark.sources import expected_tokens, generate_sequences, render_lines
from loongcollector_spark.sources.synthetic import SOURCES


def test_schema_and_invariants(spark):
    df = generate_sequences(spark, 500, partitions=4)
    assert [f.name for f in df.schema.fields] == ["doc_id", "tokens", "n_tok", "source"]
    rows = df.collect()
    assert len(rows) == 500
    for r in rows[:50]:
        assert r.n_tok == len(r.tokens)
        assert 8 <= r.n_tok <= 2048
        assert r.source in SOURCES
        assert r.doc_id.startswith(r.source)


def test_token_oracle_roundtrip(spark):
    """Any worker can recompute the exact token array from doc_id alone —
    the per-row token-array equality invariant from BASELINE.json."""
    rows = generate_sequences(spark, 200, partitions=4).collect()
    for r in rows[::7]:
        assert list(expected_tokens(r.doc_id)) == list(r.tokens)


def test_determinism_across_partitioning(spark):
    a = generate_sequences(spark, 300, partitions=2).orderBy("doc_id").collect()
    b = generate_sequences(spark, 300, partitions=7).orderBy("doc_id").collect()
    assert a == b


def test_zipf_skew_head_source(spark):
    counts = dict(
        generate_sequences(spark, 5000, partitions=8)
        .groupBy("source").count().collect()
    )
    head = counts.get("web-01", 0)
    assert 0.33 <= head / 5000 <= 0.47  # ~40% head share (FIXTURES.md F1)


def test_render_formats(spark):
    df = render_lines(generate_sequences(spark, 300, partitions=4))
    fam = df.withColumn("fam", F.split("source", "-")[0])
    web = fam.filter("fam = 'web'").select("line").first().line
    app = fam.filter("fam = 'app'").select("line").first().line
    sys = fam.filter("fam = 'sys'").select("line").first().line
    assert '"-" "curl/7.74.0" "-"' in web
    assert app.startswith("{") and '"method":' in app
    assert sys.count("\t") == 4


def test_head_generator_matches_full_generator_head(spark):
    """generate_sequences_head is byte-identical to generate_sequences on
    doc_id/source/n_tok and the first `head` tokens (the probe-input contract)."""
    from pyspark.sql import functions as F

    from loongcollector_spark.sources.synthetic import (
        generate_sequences,
        generate_sequences_head,
    )

    full = (
        generate_sequences(spark, 300, partitions=4)
        .select("doc_id", F.slice("tokens", 1, 8).alias("tokens"), "n_tok", "source")
    )
    head = generate_sequences_head(spark, 300, head=8, partitions=4)
    a = {r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"]) for r in full.collect()}
    b = {r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"]) for r in head.collect()}
    assert a == b
