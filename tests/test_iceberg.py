"""Iceberg production-sink path — gated on the iceberg-spark runtime jar.

The sandbox ships no Iceberg runtime (and no network to fetch
org.apache.iceberg:iceberg-spark-runtime), so this module SKIPS cleanly
there; in any environment with the jar on the classpath it exercises the
real create + append + overwrite cycle through ``write_sink``. Set
ICEBERG_JAR=/path/to/iceberg-spark-runtime-*.jar (or put it on the default
classpath) to run.

The parquet twin of every semantic here (append-not-truncate, first-append
creates, partition columns) runs unconditionally in test_pipeline.py — this
file only adds the catalog-backed executions.
"""

from __future__ import annotations

import os

import pytest


def _iceberg_available() -> str | None:
    jar = os.environ.get("ICEBERG_JAR")
    if jar and os.path.exists(jar):
        return jar
    return None


_JAR = _iceberg_available()

pytestmark = pytest.mark.skipif(
    _JAR is None,
    reason=(
        "iceberg-spark-runtime jar not present (sandbox has no Iceberg "
        "runtime and no network); set ICEBERG_JAR=/path/to/"
        "iceberg-spark-runtime-*.jar to exercise the production sink"
    ),
)


@pytest.fixture(scope="module")
def iceberg_spark(tmp_path_factory):
    from pyspark.sql import SparkSession

    wh = str(tmp_path_factory.mktemp("iceberg_wh"))
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("iceberg-sink-test")
        .config("spark.jars", _JAR)
        .config(
            "spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog"
        )
        .config("spark.sql.catalog.local.type", "hadoop")
        .config("spark.sql.catalog.local.warehouse", wh)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def test_iceberg_create_append_overwrite_cycle(iceberg_spark):
    from loongcollector_spark.sinks import SinkSpec, write_sink

    spark = iceberg_spark
    table = "local.db.sink_cycle"
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    df2 = spark.createDataFrame([(3, "c")], "id long, v string")

    # first append against a missing table must CREATE it
    write_sink(df1, SinkSpec("s", format="iceberg", path=table, mode="append"))
    assert spark.table(table).count() == 2

    # second append must not truncate
    write_sink(df2, SinkSpec("s", format="iceberg", path=table, mode="append"))
    assert spark.table(table).count() == 3

    # overwrite mode replaces
    write_sink(df2, SinkSpec("s", format="iceberg", path=table, mode="overwrite"))
    assert spark.table(table).count() == 1


def test_iceberg_partitioned_write(iceberg_spark):
    from loongcollector_spark.sinks import SinkSpec, write_sink

    spark = iceberg_spark
    table = "local.db.sink_part"
    df = spark.createDataFrame(
        [(1, "web"), (2, "web"), (3, "app")], "id long, source string"
    )
    write_sink(
        df,
        SinkSpec(
            "s", format="iceberg", path=table, mode="append",
            partition_by=("source",),
        ),
    )
    got = {r.source: r.n for r in
           spark.table(table).groupBy("source").count().withColumnRenamed("count", "n").collect()}
    assert got == {"web": 2, "app": 1}
