"""Enrichment / scalar derivation — the reference's add/rename/map/mask family.

Every operator here is a pure Column expression or a broadcast join — zero
shuffles on the fact table, which is what makes the enrich stage free at
100TB (it fuses into the scan/parse stage under whole-stage codegen).

Operators (SURVEY.md §2.4): add_fields, rename, dict_map (THE broadcast
lookup), geoip-style prefix lookup, cloud_meta, appender, string_replace,
desensitize, md5, base64 enc/dec, encrypt (aes), packjson, log_to_metric.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

# --- constants / renames -----------------------------------------------------

def add_fields(
    df: DataFrame, fields: Mapping[str, object], ignore_if_exist: bool = True
) -> DataFrame:
    """processor_add_fields (processor_add_fields.go:29-49)."""
    out = df
    for k, v in fields.items():
        if ignore_if_exist and k in out.columns:
            continue
        out = out.withColumn(k, F.lit(v))
    return out


def rename_fields(
    df: DataFrame, mapping: Mapping[str, str], no_key_error: bool = False
) -> DataFrame:
    """processor_rename (processor_rename.go:31-72)."""
    out = df
    for src, dst in mapping.items():
        if src not in out.columns:
            if no_key_error:
                raise KeyError(f"rename: missing key {src}")
            continue
        out = out.withColumnRenamed(src, dst)
    return out


# --- dict_map: the broadcast lookup join ------------------------------------

def dict_map(
    df: DataFrame,
    source_key: str,
    mapping: Mapping[str, str] | DataFrame,
    dest_key: str,
    missing: str | None = None,
    keep_missing: bool = True,
    max_expr_size: int = 64,
) -> DataFrame:
    """processor_dict_map (processor_dict_map.go:33-148): map SourceKey value
    through a dictionary into DestKey; missing keys get the configured
    default (``Missing``) when ``HandleMissing`` else stay null / drop.

    Physical strategy by dictionary size:
    - tiny (≤max_expr_size entries): a literal ``map[...]`` expression —
      no join at all, folds into codegen (beats any join);
    - otherwise: explicit ``broadcast()`` hash join — no shuffle of the fact
      side, the Spark twin of the reference's in-memory dict.
    """
    if isinstance(mapping, Mapping) and len(mapping) <= max_expr_size:
        kv: list[Column] = []
        for k, v in mapping.items():
            kv += [F.lit(k), F.lit(v)]
        lookup = F.try_element_at(F.create_map(*kv), F.col(source_key))
        mapped = F.coalesce(lookup, F.lit(missing)) if missing is not None else lookup
        out = df.withColumn(dest_key, mapped)
        if not keep_missing and missing is None:
            out = out.filter(F.col(dest_key).isNotNull())
        return out

    if isinstance(mapping, Mapping):
        spark = SparkSession.getActiveSession()
        dict_df = spark.createDataFrame(
            [(k, v) for k, v in mapping.items()], schema=f"`{source_key}` string, `{dest_key}` string"
        )
    else:
        dict_df = mapping.toDF(source_key, dest_key)

    joined = df.join(broadcast(dict_df), on=source_key, how="left")
    if missing is not None:
        joined = joined.withColumn(dest_key, F.coalesce(F.col(dest_key), F.lit(missing)))
    elif not keep_missing:
        joined = joined.filter(F.col(dest_key).isNotNull())
    return joined


def geo_lookup(
    df: DataFrame,
    ip_key: str,
    geo_df: DataFrame,
    prefix_len: int = 2,
) -> DataFrame:
    """processor_geoip analogue (processor_geoip.go:33-50): broadcast
    equi-join on an IP prefix key (first ``prefix_len`` octets). geo_df must
    carry an ``ip_prefix`` column plus attribute columns."""
    prefix = F.concat_ws(
        ".", *[F.split(F.col(ip_key), r"\.")[i] for i in range(prefix_len)]
    )
    out = df.withColumn("ip_prefix", prefix)
    return out.join(broadcast(geo_df), on="ip_prefix", how="left").drop("ip_prefix")


def cloud_meta(df: DataFrame, metadata: Mapping[str, str]) -> DataFrame:
    """processor_cloud_meta: constant metadata injection (region/zone/...)."""
    return add_fields(df, metadata, ignore_if_exist=False)


# --- string derivations ------------------------------------------------------

def appender(df: DataFrame, key: str, value: str, env: Mapping[str, str] | None = None) -> DataFrame:
    """processor_appender (processor_appender.go:34-44): append value (with
    {{env}} substitution resolved at PLAN time) to an existing key."""
    for name, val in (env or {}).items():
        value = value.replace("{{" + name + "}}", val)
    return df.withColumn(key, F.concat(F.coalesce(F.col(key), F.lit("")), F.lit(value)))


def string_replace(
    df: DataFrame,
    source_key: str,
    pattern: str,
    replacement: str,
    dest_key: str | None = None,
    literal: bool = False,
) -> DataFrame:
    """processor_string_replace (processor_string_replace.go:37-83)."""
    import re as _re

    pat = _re.escape(pattern) if literal else pattern
    out_col = F.regexp_replace(F.col(source_key), pat, replacement)
    return df.withColumn(dest_key or source_key, out_col)


def desensitize(
    df: DataFrame,
    source_key: str,
    regex_begin: str,
    regex_content: str,
    method: str = "const",
    replacement: str = "********",
    dest_key: str | None = None,
) -> DataFrame:
    """processor_desensitize (+_native): mask the content window that follows
    ``regex_begin`` and matches ``regex_content``. method='const' overwrites
    with ``replacement`` (pure JVM); method='md5' replaces with the md5 of the
    masked span (vectorized pandas UDF — replacement-side function calls are
    not expressible in regexp_replace)."""
    dest = dest_key or source_key
    if method == "const":
        return df.withColumn(
            dest,
            F.regexp_replace(
                F.col(source_key), f"({regex_begin})(?:{regex_content})", "$1" + replacement
            ),
        )

    import hashlib
    import re as _re

    from pyspark.sql.functions import pandas_udf

    compiled = _re.compile(f"({regex_begin})({regex_content})")

    @pandas_udf("string")
    def mask_md5(s: pd.Series) -> pd.Series:
        def one(v: str | None) -> str | None:
            if v is None:
                return None
            return compiled.sub(
                lambda m: m.group(1) + hashlib.md5(m.group(2).encode()).hexdigest(), v
            )

        return s.map(one)

    return df.withColumn(dest, mask_md5(F.col(source_key)))


def otel_span_shape(
    df: DataFrame,
    trace_id_key: str,
    span_id_key: str,
    name_key: str,
    start_key: str,
    end_key: str | None = None,
    kind: str = "SPAN_KIND_INTERNAL",
    attr_keys: Sequence[str] = (),
) -> DataFrame:
    """processor_otel_trace (plugins/processor/otel/processor_otel_trace.go:53):
    map k/v log fields into the OTel span shape — pure column projection plus
    an attributes map assembled from the remaining keys."""
    attrs = F.map_from_arrays(
        F.array(*[F.lit(k) for k in attr_keys]),
        F.array(*[F.col(k).cast("string") for k in attr_keys]),
    ) if attr_keys else F.map_from_arrays(F.array().cast("array<string>"), F.array().cast("array<string>"))
    out = df.select(
        F.col(trace_id_key).cast("string").alias("trace_id"),
        F.col(span_id_key).cast("string").alias("span_id"),
        F.col(name_key).cast("string").alias("span_name"),
        F.lit(kind).alias("span_kind"),
        F.col(start_key).alias("start_time"),
        (F.col(end_key) if end_key else F.col(start_key)).alias("end_time"),
        attrs.alias("attributes"),
    )
    return out


def anchor(
    df: DataFrame,
    source_key: str,
    start: str,
    stop: str,
    dest_key: str,
    expand_json: bool = False,
    json_keys: Sequence[str] | None = None,
) -> DataFrame:
    """processor_anchor (plugins/processor/anchor/anchor.go:43-66): extract
    the substring between the ``start`` and ``stop`` anchor strings into
    ``dest_key``; optionally expand the extracted span as JSON members."""
    import re as _re

    pat = f"{_re.escape(start)}(.*?){_re.escape(stop)}"
    out = df.withColumn(dest_key, F.regexp_extract(F.col(source_key), pat, 1))
    if expand_json:
        for k in json_keys or ():
            out = out.withColumn(k, F.get_json_object(F.col(dest_key), f"$.{k}"))
    return out


def md5_field(df: DataFrame, source_key: str, md5_key: str) -> DataFrame:
    """processor_md5 (processor_md5.go:26-32)."""
    return df.withColumn(md5_key, F.md5(F.col(source_key)))


def base64_encode(df: DataFrame, source_key: str, dest_key: str | None = None) -> DataFrame:
    return df.withColumn(dest_key or source_key, F.base64(F.col(source_key).cast("binary")))


def base64_decode(df: DataFrame, source_key: str, dest_key: str | None = None) -> DataFrame:
    return df.withColumn(dest_key or source_key, F.unbase64(F.col(source_key)).cast("string"))


def encrypt_fields(df: DataFrame, keys: Sequence[str], key: str, mode: str = "GCM") -> DataFrame:
    """processor_encrypt (AES) — Spark 3.3+ aes_encrypt builtin."""
    out = df
    for k in keys:
        out = out.withColumn(
            k, F.base64(F.aes_encrypt(F.col(k).cast("binary"), F.lit(key), F.lit(mode)))
        )
    return out


def pack_json(df: DataFrame, source_keys: Sequence[str], dest_key: str, drop_packed: bool = False) -> DataFrame:
    """processor_packjson (processor_packjson.go:31-39): pack several keys
    into one JSON object value."""
    out = df.withColumn(dest_key, F.to_json(F.struct(*[F.col(k) for k in source_keys])))
    if drop_packed:
        out = out.drop(*source_keys)
    return out


# --- log -> metric shaping ---------------------------------------------------

METRIC_LABEL_SEP = "#$#"


def log_to_metric(
    df: DataFrame,
    label_keys: Sequence[str],
    name_key: str,
    value_key: str,
    time_col: str | None = None,
) -> DataFrame:
    """processor_log_to_sls_metric (logtoslsmetric/...go:31-56): project log
    fields into metric shape — ``__labels__`` is the SORTED k=v list joined by
    '#$#', ``__value__`` is the parsed double, names validated by regex."""
    labels = F.array_join(
        F.sort_array(
            F.array(*[F.concat(F.lit(k + "="), F.col(k).cast("string")) for k in label_keys])
        ),
        METRIC_LABEL_SEP,
    )
    name_ok = F.col(name_key).rlike(r"^[a-zA-Z_:][a-zA-Z0-9_:]*$")
    out = (
        df.withColumn("__labels__", labels)
        .withColumn("__name__", F.when(name_ok, F.col(name_key)))
        .withColumn("__value__", F.col(value_key).cast("double"))
    )
    if time_col:
        out = out.withColumn(
            "__time_nano__", (F.col(time_col).cast("double") * 1e9).cast("long")
        )
    return out.filter(F.col("__name__").isNotNull() & F.col("__value__").isNotNull())
