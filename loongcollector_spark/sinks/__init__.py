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
