"""Sinks (flushers) — conditional per-sink writes with batching knobs.

The reference's 15+ flushers (SURVEY.md §2.7) collapse to: serialize + batch
+ compress + deliver. Spark-first mapping: each sink is a filtered view
written to its own table/path; batching = ``maxRecordsPerFile`` (the
Batcher's MaxCnt twin); compression = the file codec (the lz4/zstd twin);
delivery retry/exactly-once = the output-commit protocol + lineage manifests
(lineage.py).

Provided sink kinds: parquet / json (flusher_file), noop (flusher_blackhole),
console (flusher_stdout), memory/checker (flusher_checker — test assertions).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class SinkSpec:
    name: str
    format: str = "parquet"  # parquet | json | csv | noop | console | memory
    path: str | None = None
    mode: str = "overwrite"
    partition_by: tuple[str, ...] = ()
    max_records_per_file: int = 0  # Batcher MaxCnt analogue; 0 = unlimited
    compression: str | None = None  # codec (lz4/zstd/snappy/gzip for parquet)
    options: Mapping[str, str] = field(default_factory=dict)


def write_sink(df: DataFrame, spec: SinkSpec) -> dict[str, Any]:
    """Deliver one sink; returns driver-side delivery counters."""
    if spec.format == "iceberg":
        # Production sink format (north rule): atomic-commit Iceberg tables,
        # `path` holding the catalog table name. Gated: this sandbox ships no
        # Iceberg runtime, so fail with a clear remedy instead of a classpath
        # error. Parquet sinks below share the same layout semantics
        # (partition columns, maxRecordsPerFile, codec).
        jvm = df.sparkSession._jvm
        try:
            jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        except Exception as e:
            raise RuntimeError(
                "iceberg sink requires the iceberg-spark-runtime jar on the "
                "classpath and a configured spark_catalog; use format='parquet' "
                "here or submit with --packages org.apache.iceberg:iceberg-"
                "spark-runtime-4.0_2.13"
            ) from e
        writer = df.writeTo(spec.path)
        if spec.partition_by:
            from pyspark.sql import functions as _F

            writer = writer.partitionedBy(*[_F.col(c) for c in spec.partition_by])
        # honor spec.mode: append must NOT truncate the table (a streaming
        # foreachBatch delivering per-micro-batch appends would otherwise keep
        # only the last batch's rows)
        if spec.mode == "append":
            writer.append()
        else:
            writer.createOrReplace()
        return {"sink": spec.name, "delivered": True, "table": spec.path}
    if spec.format == "noop":
        df.write.format("noop").mode("overwrite").save()
        return {"sink": spec.name, "delivered": True}
    if spec.format == "console":
        df.show(20, truncate=False)
        return {"sink": spec.name, "delivered": True}
    if spec.format == "memory":
        rows = df.collect()
        return {"sink": spec.name, "delivered": True, "rows": rows}

    writer = df.write.mode(spec.mode)
    if spec.partition_by:
        writer = writer.partitionBy(*spec.partition_by)
    if spec.max_records_per_file:
        writer = writer.option("maxRecordsPerFile", spec.max_records_per_file)
    if spec.compression:
        writer = writer.option("compression", spec.compression)
    for k, v in spec.options.items():
        writer = writer.option(k, v)
    writer.format(spec.format).save(spec.path)
    return {"sink": spec.name, "delivered": True, "path": spec.path}
