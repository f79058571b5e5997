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
