"""Sinks (flushers) — conditional per-sink writes with batching knobs.

The reference's 15+ flushers (SURVEY.md §2.7) collapse to: serialize + batch
+ compress + deliver. Spark-first mapping: each sink is a filtered view
written to its own table/path; batching = ``maxRecordsPerFile`` (the
Batcher's MaxCnt twin); compression = the file codec (the lz4/zstd twin);
delivery retry/exactly-once = the output-commit protocol + lineage manifests
(lineage.py).

Provided sink kinds: parquet / json (flusher_file), noop (flusher_blackhole),
console (flusher_stdout), memory/checker (flusher_checker — test assertions),
kafka (flusher_kafka/_v2 over Spark's own connector — encoded value +
per-row dynamic topic + shard-hash partition key; gated on the connector
jar), iceberg (production table sink; gated on the runtime jar).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class SinkSpec:
    name: str
    format: str = "parquet"  # parquet | json | csv | text | noop | console | memory
    path: str | None = None
    mode: str = "overwrite"
    partition_by: tuple[str, ...] = ()
    max_records_per_file: int = 0  # Batcher MaxCnt analogue; 0 = unlimited
    compression: str | None = None  # codec (lz4/zstd/snappy/gzip for parquet)
    options: Mapping[str, str] = field(default_factory=dict)
    # protocol converter encoding (pkg/protocol/converter/converter.go:29-41):
    # none | custom_single | custom_single_flatten | jsonline | influxdb |
    # otlp_log | raw
    encoding: str = "none"
    tag_columns: tuple[str, ...] = ()
    time_column: str | None = None
    raw_column: str | None = None  # for encoding='raw'


def _kv_map(cols: list[str]):
    return F.map_from_arrays(
        F.array(*[F.lit(c) for c in cols]),
        F.array(*[F.col(c).cast("string") for c in cols]),
    )


def _serialize_expr(df: DataFrame, spec: SinkSpec):
    """Protocol converter serializers (pkg/protocol/converter/): each row
    becomes one serialized string — pure column expressions (to_json /
    concat), no Python in the row path. Returns the value Column.

    - custom_single (custom_single_log.go:32-62): {"time": t, "contents":
      {...}, "tags": {...}} per row, JSON.
    - custom_single_flatten / jsonline (converter_single_log_flatten.go:23-59,
      jsonline.go:16-41): contents+tags flattened into one object + "time";
      jsonline is the same object — newline joining is the text writer.
    - influxdb (influxdb_metric.go): metric line protocol
      ``name[,tags] value=<v> <ts>`` from __name__/__labels__/__value__/
      __time_nano__ shaped rows (log_to_metric / otel_metric output).
    - raw (converter_raw.go): the designated content column verbatim.
    """
    enc = spec.encoding
    tag_cols = [c for c in spec.tag_columns if c in df.columns]
    content_cols = [
        c
        for c in df.columns
        if c not in tag_cols and c != spec.time_column and not c.startswith("__")
    ]
    t = (F.col(spec.time_column) if spec.time_column else F.lit(0)).alias("time")
    if enc == "custom_single":
        obj = F.to_json(
            F.struct(t, _kv_map(content_cols).alias("contents"), _kv_map(tag_cols).alias("tags"))
        )
    elif enc in ("custom_single_flatten", "jsonline"):
        # a content/tag column literally named "time" would duplicate the
        # protocol time key in to_json; the reference flattens into one Go
        # map where the protocol time wins (converter_single_log_flatten.go
        # sets it last) — so exclude same-named fields
        obj = F.to_json(
            F.struct(
                *[F.col(c) for c in content_cols if c != "time"],
                *[F.col(c) for c in tag_cols if c != "time"],
                t,
            )
        )
    elif enc == "influxdb":
        labels = F.col("__labels__")
        from loongcollector_spark.operators.enrich import (
            METRIC_KV_SEP,
            METRIC_LABEL_SEP,
        )

        # __labels__ carries 'k#$#v|k2#$#v2' (readSortedLabels,
        # converter_sls_metric.go:101-130); line protocol wants ',k=v,k2=v2'
        tags = F.replace(
            F.replace(labels, F.lit(METRIC_KV_SEP), F.lit("=")),
            F.lit(METRIC_LABEL_SEP),
            F.lit(","),
        )
        obj = F.concat(
            F.col("__name__"),
            F.when(
                labels.isNotNull() & (labels != ""),
                F.concat(F.lit(","), tags),
            ).otherwise(F.lit("")),
            F.lit(" value="),
            F.col("__value__").cast("string"),
            # line protocol allows a timestamp-less line; a null
            # __time_nano__ (no MetricTimeKey configured) must not null
            # out the whole row
            F.coalesce(
                F.concat(F.lit(" "), F.col("__time_nano__").cast("string")),
                F.lit(""),
            ),
        )
    elif enc == "otlp_log":
        # aggregator_opentelemetry / flusher_opentelemetry shape
        # (plugins/aggregator/opentelemetry): one OTLP logRecord per row —
        # body = the designated content column, remaining content + tags as
        # string attributes, event time as timeUnixNano
        body_col = spec.raw_column or (content_cols[0] if content_cols else None)
        if body_col is None:
            raise ValueError("encoding='otlp_log' needs raw_column or a content column")
        attr_cols = [c for c in content_cols if c != body_col] + tag_cols
        attrs = F.array(
            *[
                F.struct(
                    F.lit(c).alias("key"),
                    F.struct(F.col(c).cast("string").alias("stringValue")).alias("value"),
                )
                for c in attr_cols
            ]
        )
        fields = []
        if spec.time_column:
            fields.append(
                (F.col(spec.time_column).cast("long") * 1_000_000_000)
                .cast("string")
                .alias("timeUnixNano")
            )
        fields.append(F.struct(F.col(body_col).cast("string").alias("stringValue")).alias("body"))
        fields.append(attrs.alias("attributes"))
        obj = F.to_json(F.struct(*fields))
    elif enc == "raw":
        if not spec.raw_column and not content_cols:
            raise ValueError(
                "encoding='raw' needs raw_column (no eligible content column: "
                "all columns are tags, the time column, or internal)"
            )
        obj = F.col(spec.raw_column or content_cols[0]).cast("string")
    else:
        raise ValueError(f"unknown sink encoding {enc!r}")
    return obj


def serialize_rows(df: DataFrame, spec: SinkSpec) -> DataFrame:
    """Each row serialized to one string in column ``value``; partition
    columns ride along (the text writer pulls them out as directories, so
    grouped-pack sinks keep their co-location contract). A partition column
    absent from the frame fails HERE with the sink name instead of as a
    bare writer error; a partition column itself named ``value`` pushes the
    serialized column to a non-colliding name (the text writer only needs
    one data column, its name is not part of the output)."""
    missing = [c for c in spec.partition_by if c not in df.columns]
    if missing:
        raise ValueError(
            f"sink {spec.name!r}: partition column(s) {missing} not in frame "
            f"(have {df.columns})"
        )
    val = "value"
    while val in spec.partition_by:
        val = "_" + val
    keep = [F.col(c) for c in spec.partition_by]
    return df.select(_serialize_expr(df, spec).alias(val), *keep)


def kafka_records(df: DataFrame, spec: SinkSpec) -> DataFrame:
    """Kafka record shape for a sink: ``value`` from the converter encoding
    (defaults to jsonline when the spec says 'none' — the v2 plugin always
    runs its converter), plus per-row ``topic``/``key`` when the routed frame
    carries them (dynamic_topic's __topic__ column; __shardhash__ as the
    partition key, mirroring flusher_kafka_v2's HashKeys partitioning). One
    pure projection — no joins, no shuffle."""
    if spec.encoding == "none":
        import dataclasses

        spec = dataclasses.replace(spec, encoding="jsonline")
    cols = [_serialize_expr(df, spec).alias("value")]
    if "__topic__" in df.columns:
        cols.append(F.col("__topic__").cast("string").alias("topic"))
    if "__shardhash__" in df.columns:
        cols.append(F.col("__shardhash__").cast("string").alias("key"))
    return df.select(*cols)


def write_sink(df: DataFrame, spec: SinkSpec) -> dict[str, Any]:
    """Deliver one sink; returns driver-side delivery counters."""
    if spec.encoding != "none" and spec.format != "kafka":
        # converter encodings serialize to one string per row; delivery is
        # newline-separated text (the jsonline/flusher stream shape).
        # kafka serializes inside its own branch (kafka_records keeps the
        # per-row topic/key columns alongside the encoded value).
        df = serialize_rows(df, spec)
        if spec.format not in ("noop", "console", "memory"):
            import dataclasses

            spec = dataclasses.replace(spec, format="text", encoding="none")
    if spec.format == "kafka":
        # flusher_kafka / flusher_kafka_v2 twin over Spark's own kafka sink:
        # the converter encoding produces the message value (the v2 plugin's
        # converter chain), the topic comes per-row from dynamic_topic's
        # __topic__ column when present, else spec.options["topic"]. Gated:
        # the spark-sql-kafka connector jar is not bundled with pyspark.
        jvm = df.sparkSession._jvm
        try:
            jvm.java.lang.Class.forName(
                "org.apache.spark.sql.kafka010.KafkaSourceProvider"
            )
        except Exception as e:
            raise RuntimeError(
                "kafka sink requires the spark-sql-kafka connector on the "
                "classpath; submit with --packages org.apache.spark:"
                "spark-sql-kafka-0-10_2.13:<spark-version>"
            ) from e
        payload = kafka_records(df, spec)
        writer = payload.write.format("kafka")
        for k, v in spec.options.items():
            if k != "topic":
                writer = writer.option(k, v)
        if "topic" not in payload.columns:
            topic = spec.options.get("topic", spec.path)
            if not topic:
                raise ValueError(
                    "kafka sink needs a topic: set options['topic'] / path, "
                    "or add a per-row __topic__ column via dynamic_topic"
                )
            writer = writer.option("topic", topic)
        writer.save()
        return {"sink": spec.name, "delivered": True}
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
        # only the last batch's rows); the FIRST append against a fresh table
        # creates it instead of failing. Existence is probed via the catalog
        # (not by parsing exception text, which varies across Spark/catalog
        # versions and locales).
        if spec.mode == "append":
            if df.sparkSession.catalog.tableExists(spec.path):
                writer.append()
            else:
                writer.create()
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
