"""Plan-quality assertions — the scan/join shapes the 100 TB design relies on.

These freeze the physical-plan properties the module docstrings claim:
column pruning + predicate pushdown reaching the parquet scan, broadcast
joins on small dimensions, and whole-stage codegen on the JVM parse path.
A regression that silently de-optimizes a plan (e.g. a UDF blocking
pushdown, a join losing its broadcast hint) fails here rather than
surfacing as a 100× slowdown on real data.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_prunes_and_pushes_down(spark):
    """A filtered projection over parquet must push the filter and read only
    the referenced columns (ReadSchema narrow, PushedFilters non-empty)."""
    from pyspark.sql import functions as F

    from loongcollector_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    q = docs.filter(F.col("lang") == "en").select("doc_id", "n_chars")
    plan = _plan(q)
    assert "PushedFilters: [" in plan and "IsNotNull(lang)" in plan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read and "n_chars" in read and "lang" in read
    assert "text" not in read  # the wide column stays unread


def test_dict_map_broadcasts_small_side(spark):
    """dict_map's lookup join must be a BroadcastHashJoin — the fact table
    never shuffles for a small dimension."""
    from loongcollector_spark.operators.enrich import dict_map
    from loongcollector_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    mapping = {"en": "english", "de": "german", "zh": "chinese"}
    out = dict_map(docs, "lang", mapping, "lang_name", missing="other")
    plan = _plan(out)
    # inline maps compile to a when/element_at chain or a broadcast join —
    # either way no SortMergeJoin / shuffle may appear
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_geo_cidr_join_broadcasts(spark):
    """The CIDR interval join is an /8-bucketed broadcast equi-join: the
    fact side must not shuffle."""
    from pyspark.sql import functions as F

    from loongcollector_spark.operators.enrich import geo_cidr_lookup
    from loongcollector_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events").withColumn(
        "ip",
        F.concat_ws(
            ".",
            (F.col("event_id") % 200 + 10).cast("string"),
            F.lit("0"), F.lit("0"), F.lit("1"),
        ),
    )
    nets = spark.createDataFrame(
        [("10.0.0.0/10", "net-a"), ("100.0.0.0/15", "net-b")],
        "cidr string, net string",
    )
    out = geo_cidr_lookup(ev, "ip", nets)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_parse_chain_stays_in_codegen(spark):
    """The JVM parse path (regex extract + json + filters) must fuse into
    whole-stage codegen — no Python evaluation node in the plan."""
    from loongcollector_spark.operators.parse_regex import parse_regex
    from loongcollector_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events")
    out = parse_regex(ev, "props", r'"k": (\d+)', ["kval"])
    plan = _plan(out)
    # "*(n) " prefixes mark whole-stage-codegen subtrees in executedPlan
    assert "*(1)" in plan or "WholeStageCodegen" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_token_pack_chunks_single_exchange(spark):
    """Per-shard packing must be ONE hash exchange: the window sorts inside
    the source partitioning and the (source, chunk_id) rollup reuses it —
    no second shuffle, no global total-order sort."""
    from loongcollector_spark.operators.token_ops import token_pack_chunks

    df = spark.createDataFrame(
        [("d1", 5, "s"), ("d2", 3, "t")], "doc_id string, n_tok int, source string"
    )
    out = (
        token_pack_chunks(df, chunk_len=4, partition_by="source")
        .groupBy("source", "chunk_id")
        .count()
    )
    plan = _plan(out)
    assert plan.count("Exchange") == 1
    assert "rangepartitioning" not in plan.lower()  # no global sort


def test_repeated_substrings_shuffles_only_partials(spark):
    """The inverted index must shuffle (hash, count) partials once — a
    partial_count aggregate before the single exchange, never the token
    arrays."""
    from loongcollector_spark.operators.token_ops import token_repeated_substrings

    df = spark.createDataFrame(
        [("a", [1, 2, 3, 4])], "doc_id string, tokens array<int>"
    )
    out = token_repeated_substrings(df, w=3)
    plan = _plan(out)
    assert plan.count("Exchange") == 1
    assert "partial_count" in plan or "partial" in plan.lower()


def test_pii_redact_stays_in_codegen(spark):
    """PII masking is pure regexp column work — no Python eval node."""
    from loongcollector_spark.functions import text as tx
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("a@b.co",)], "text string")
    out = df.select(tx.pii_redact(F.col("text")).alias("red"))
    plan = _plan(out)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_line_correction_zero_exchange(spark):
    """RefinedWeb line correction is per-row array work — it must fuse into
    the scan with NO exchange and no Python eval node."""
    from loongcollector_spark.functions import text as tx
    from loongcollector_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    out = tx.line_correction(docs, "text", "doc_id")
    plan = _plan(out)
    assert plan.count("Exchange") == 0
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_c4_span_dedup_three_linear_exchanges(spark):
    """C4 span dedup must cost exactly its three declared linear shuffles
    (span-key window, per-doc reconstruction, spine join) — no global sort,
    no extra exchange sneaking in."""
    from loongcollector_spark.functions import text as tx
    from loongcollector_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    out = tx.c4_span_dedup(docs, "text", "doc_id")
    plan = _plan(out)
    assert plan.count("Exchange") == 3
    assert "rangepartitioning" not in plan.lower()


def test_pq_topk_zero_exchange_before_cut(spark):
    """PQ/ADC scoring fuses into the scan: both cuts are TakeOrdered
    (per-partition top-k + driver merge), so the WHOLE plan has zero
    exchanges and no Python eval node."""
    from pyspark.sql import functions as F

    from loongcollector_spark.functions import similarity
    from loongcollector_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    out = similarity.pq_topk(
        emb, "embedding", "vec_id", q, k=5,
        m_subspaces=8, n_codes=8, exclude_id=0,
    )
    plan = _plan(out)
    assert plan.count("Exchange") == 0
    assert plan.count("TakeOrderedAndProject") == 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_html_strip_zero_exchange(spark):
    """html_strip is a scan-fused regexp chain: extracting text for every
    doc must introduce NO Exchange — one projection over the scan."""
    from pyspark.sql import functions as F

    from loongcollector_spark.functions.text import html_strip
    from loongcollector_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    q = docs.select("doc_id", html_strip(F.col("text")).alias("t"))
    assert "Exchange" not in _plan(q)


def test_url_canonical_blocklist_scan_side(spark):
    """url_canonicalize + domain_blocklist_filter stay scan-side: the
    filtered projection has no Exchange and no join — the blocklist is a
    plan-time literal isin, not a join relation."""
    from pyspark.sql import functions as F

    from loongcollector_spark.functions.text import (
        domain_blocklist_filter,
        url_canonicalize,
    )
    from loongcollector_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").select(
        "doc_id",
        F.concat(F.lit("http://h"), F.col("doc_id").cast("string"),
                 F.lit(".example.com/p")).alias("url"),
    )
    q = domain_blocklist_filter(
        docs.select("doc_id", url_canonicalize(F.col("url")).alias("url")),
        "url", ["blocked.com"],
    )
    plan = _plan(q)
    assert "Exchange" not in plan and "Join" not in plan
