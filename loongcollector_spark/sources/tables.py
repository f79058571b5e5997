"""Batch scan helpers over the test parquet tables.

Mirrors the reference's input plugins (`input_file` / `input_static_file`,
core/plugin/input/InputFile.h:31-67) collapsed to declarative scans: Spark's
parquet source already gives us glob discovery, predicate pushdown, column
pruning and partition pruning — the reference's polling/inotify/checkpoint
machinery is connector plumbing Spark owns.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Filters/projections applied by callers are pushed
    down into this scan by Catalyst (verify with .explain: PushedFilters)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
