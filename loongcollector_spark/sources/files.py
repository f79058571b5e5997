"""Raw log-file source — the batch analogue of ``input_file``.

The reference tails files via polling/inotify, tags every event group with
``__tag__:__path__`` and can derive a topic from the path (TopicFormat regex,
core/plugin/input/InputFile.h:31-67; file discovery static_file/...). Spark's
text source owns discovery (globs, recursive lookup), splitting and
scheduling; what remains of the input plugin is the tagging contract:

- ``path_tag``: the source file path from the scan's ``_metadata`` column —
  no extra I/O, available on every file-based source.
- ``topic_format``: regex with one capture group applied to the path →
  ``__topic__`` (empty when unmatched), as the reference's TopicFormat.
- ``line_offset``: a per-file ordering key for downstream multiline merge /
  context packing. Spark's text reader preserves within-file line order
  inside each split and splits scan forward, so the per-partition monotonic
  id ranked per file is a faithful arrival order (the streaming twin gets
  real offsets from the checkpointed file source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PATH_TAG = "__tag__:__path__"


def read_log_files(
    spark: SparkSession,
    path: str,
    line_col: str = "content",
    path_tag: bool = True,
    topic_format: str | None = None,
    line_offset: bool = False,
    recursive: bool = True,
) -> DataFrame:
    """Scan text log files under ``path`` (file, directory, or glob) into one
    line per row with the reference's file-source tags."""
    reader = spark.read.option("recursiveFileLookup", str(recursive).lower())
    df = reader.text(path).select(
        F.col("value").alias(line_col), F.col("_metadata.file_path").alias("__path__")
    )
    if topic_format:
        df = df.withColumn(
            "__topic__", F.regexp_extract(F.col("__path__"), topic_format, 1)
        )
    if line_offset:
        from pyspark.sql import Window

        mono = F.monotonically_increasing_id()
        df = df.withColumn("__mono__", mono).withColumn(
            "__offset__",
            F.row_number().over(
                Window.partitionBy("__path__").orderBy(F.col("__mono__"))
            ).cast("long")
            - 1,
        ).drop("__mono__")
    if path_tag:
        df = df.withColumnRenamed("__path__", PATH_TAG)
    else:
        df = df.drop("__path__")
    return df
