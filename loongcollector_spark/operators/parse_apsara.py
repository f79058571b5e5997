"""Apsara log format parser — ``processor_parse_apsara_native``.

Reference (core/plugin/processor/ProcessorParseApsaraNative.cpp): lines like

    [2024-01-01 12:00:00.123456]\t[INFO]\t[12345]\t[cls:42]\tkey1:val1\tkey2:val2

microsecond time prefix in brackets, then tab-separated fields, trailing
``key:value`` pairs. Duplicate keys are tolerated by the reference's ordered
content list (core/models/LogEvent.h:115-121, the SLS log-reduce contract);
two mappings are offered:

- ``map_column`` (fast path): duplicates collapse last-wins — a map column
  prunes/serializes cheaply but cannot hold ordered repeats;
- ``ordered_pairs_column`` (opt-in fidelity path): the raw
  ``array<struct<key,value>>`` in insertion order, duplicates preserved —
  exactly the reference's ordered content list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from loongcollector_spark.operators.parse_common import ParserOptions, apply_parser_options

APSARA_TIME_RE = r"^\[(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}(?:\.\d+)?)\]"


def parse_apsara(
    df: DataFrame,
    source_key: str,
    map_column: str = "fields",
    time_column: str = "apsara_time",
    level_column: str = "__LEVEL__",
    ordered_pairs_column: str | None = None,
    timezone: str | None = None,
    options: ParserOptions | None = None,
) -> DataFrame:
    """``timezone`` is the native Timezone param ("GMT+08:00" form,
    ProcessorParseApsaraNative.cpp:52-70 / ParseLogTimeZoneOffsetSecond):
    the log's wall-clock time is interpreted in that zone and normalized,
    the columnar analogue of the offset subtraction."""
    options = options or ParserOptions()
    src = F.col(source_key)
    success = src.rlike(APSARA_TIME_RE)
    time_str = F.regexp_extract(src, APSARA_TIME_RE, 1)
    # bracketed level: first [XXX] after the time block that is a known level
    level = F.regexp_extract(src, r"\[(INFO|WARNING|WARN|ERROR|DEBUG|FATAL)\]", 1)
    # trailing key:value fields (tab-separated, each containing ':')
    tail = F.regexp_replace(src, APSARA_TIME_RE, "")
    pairs = F.filter(F.split(tail, r"\t"), lambda p: p.rlike(r"^[^\[:]+:"))
    entries = F.transform(
        pairs,
        lambda p: F.struct(
            F.regexp_extract(p, r"^([^:]+):", 1).alias("key"),
            F.regexp_replace(p, r"^[^:]+:", "").alias("value"),
        ),
    )
    kv = F.map_from_entries(entries)
    extracted = {
        time_column: (
            F.to_utc_timestamp(F.to_timestamp(time_str), timezone)
            if timezone else F.to_timestamp(time_str)
        ),
        level_column: level,
        map_column: kv,
    }
    if ordered_pairs_column:
        extracted[ordered_pairs_column] = entries
    return apply_parser_options(df, source_key, success, extracted, options)
