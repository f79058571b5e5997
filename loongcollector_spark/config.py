"""Pipeline config loader: the reference's YAML/JSON pipeline shape → PipelineSpec.

The reference parses `inputs → processors → aggregators → flushers` configs
(example_config/data_pipelines/nginx-regex.yaml:24-50; C++ loader
core/collection_pipeline/CollectionPipeline.cpp:76-120, Go loader
pluginmanager/logstore_config.go:306+). Our loader accepts the same shape of
document (JSON always; YAML when a yaml module is available) and compiles it
to a :class:`loongcollector_spark.pipeline.PipelineSpec`:

```json
{
  "name": "nginx",
  "processors": [["parse_regex", {"source_key": "line", "pattern": "...", "keys": [...]}]],
  "routes": [{"sink": "errors", "content_key": "status", "content_regex": "5\\d\\d"}],
  "default_sink": "default",
  "shard_keys": ["source", "doc_id"], "shard_count": 16,
  "tags": {"env": "prod"},
  "sinks": {"errors": {"format": "parquet", "path": "/out/errors"}}
}
```
"""

from __future__ import annotations

import json
from typing import Any, Mapping

from loongcollector_spark.operators.route import Condition, Route
from loongcollector_spark.pipeline import PipelineSpec
from loongcollector_spark.sinks import SinkSpec

_CONDITION_FIELDS = (
    "event_type", "tag_key", "tag_value", "content_key", "content_regex", "discard_tag",
)


def route_from_dict(d: Mapping[str, Any]) -> Route:
    cond_kwargs = {k: d[k] for k in _CONDITION_FIELDS if k in d}
    condition = Condition(**cond_kwargs) if cond_kwargs else None
    return Route(sink=d["sink"], condition=condition)


def sink_from_dict(name: str, d: Mapping[str, Any]) -> SinkSpec:
    return SinkSpec(
        name=name,
        format=d.get("format", "parquet"),
        path=d.get("path"),
        mode=d.get("mode", "overwrite"),
        partition_by=tuple(d.get("partition_by", ())),
        max_records_per_file=int(d.get("max_records_per_file", 0)),
        compression=d.get("compression"),
        options=d.get("options", {}),
    )


def spec_from_dict(d: Mapping[str, Any]) -> PipelineSpec:
    return PipelineSpec(
        name=d.get("name", "pipeline"),
        processors=[(p[0], p[1]) for p in d.get("processors", [])],
        routes=[route_from_dict(r) for r in d.get("routes", [])],
        route_mode=d.get("route_mode", "first_match"),
        default_sink=d.get("default_sink", "default"),
        drop_dismatch=bool(d.get("drop_dismatch", False)),
        shard_keys=tuple(d.get("shard_keys", ("source", "doc_id"))),
        shard_count=int(d.get("shard_count", 16)),
        tags=d.get("tags", {}),
        sinks={name: sink_from_dict(name, s) for name, s in d.get("sinks", {}).items()},
        metrics_source_col=d.get("metrics_source_col", "source"),
        metrics_tokens_col=d.get("metrics_tokens_col", "n_tok"),
    )


def _load_doc(path: str) -> Mapping[str, Any]:
    with open(path) as fh:
        text = fh.read()
    if path.endswith((".yaml", ".yml")):
        try:
            import yaml  # optional dependency, like the reference's YAML support
        except ImportError as e:
            raise ImportError("YAML configs need PyYAML; use JSON instead") from e
        return yaml.safe_load(text)
    return json.loads(text)


def load_spec(path: str) -> PipelineSpec:
    """Load a pipeline spec from a JSON (or, if PyYAML is present, YAML) file.
    Both shapes are accepted: this package's own dict shape (module doc) and
    the reference's native ``inputs/processors/flushers`` pipeline YAML
    (detected by the ``inputs``/``flushers`` keys)."""
    doc = _load_doc(path)
    if "flushers" in doc or "inputs" in doc:
        return spec_from_native(doc)[0]
    return spec_from_dict(doc)


# --------------------------------------------------------------------------
# Native reference-config translation
# --------------------------------------------------------------------------

def _native_options(p: Mapping[str, Any]):
    from loongcollector_spark.operators.parse_common import ParserOptions

    keep = bool(p.get("KeepSource", False))
    return ParserOptions(
        keep_source_on_success=keep,
        keep_source_on_fail=bool(p.get("KeepSourceIfParseError", True)),
    )


def _native_processor(p: Mapping[str, Any]) -> tuple[str, dict]:
    """One reference processor block (Type + PascalCase params) → a
    PROCESSORS-registry call. Covers the plugin types the shipped
    example_config/data_pipelines/*.yaml use; extend the table for more."""
    t = p["Type"]
    src = p.get("SourceKey", "content")
    if t in ("processor_regex", "processor_parse_regex_native"):
        return "parse_regex", {
            "source_key": src,
            "pattern": p["Regex"],
            "keys": list(p["Keys"]),
            "options": _native_options(p),
        }
    if t in ("processor_json", "processor_parse_json_native"):
        return "expand_json", {
            "source_key": src,
            "expand_depth": int(p.get("ExpandDepth", 0) or 1),
            "connector": p.get("ExpandConnector", "_"),
            "prefix": p.get("Prefix", ""),
            "options": _native_options(p),
        }
    if t in ("processor_split_char", "processor_parse_delimiter_native"):
        return "parse_delimiter", {
            "source_key": src,
            "separator": p.get("SplitSep", p.get("Separator", "\t")),
            "keys": list(p.get("SplitKeys", p.get("Keys", []))),
            "options": _native_options(p),
        }
    if t == "processor_grok":
        return "parse_grok", {
            "source_key": src,
            "match": list(p["Match"]),
            "dictionary": dict(p.get("CustomPatterns", {}) or {}),
            "ignore_parse_failure": bool(p.get("IgnoreParseFailure", True)),
            "keep_source": bool(p.get("KeepSource", True)),
        }
    if t == "processor_split_log_regex":
        from loongcollector_spark.sources.files import PATH_TAG

        return "merge_multiline", {
            "line_col": p.get("SplitKey", "content"),
            "file_col": PATH_TAG,
            "offset_col": "__offset__",
            "start_pattern": p["SplitRegex"],
        }
    raise KeyError(f"unsupported native processor type {t!r}")


def _native_sink(f: Mapping[str, Any], overrides: Mapping[str, Mapping[str, Any]]) -> SinkSpec:
    t = f["Type"]
    name = {"flusher_sls": "sls", "flusher_stdout": "stdout",
            "flusher_file": "file"}.get(t, t.removeprefix("flusher_"))
    if name in overrides:
        return sink_from_dict(name, overrides[name])
    if t == "flusher_file":
        return SinkSpec(name=name, format="text", path=f.get("FileName"))
    if t in ("flusher_kafka", "flusher_kafka_v2"):
        opts = {"kafka.bootstrap.servers": ",".join(f.get("Brokers", []))}
        if f.get("Topic"):
            opts["topic"] = f["Topic"]
        return SinkSpec(name=name, format="kafka", options=opts)
    # network flushers (sls/kafka/...) have no sandbox endpoint: deliver to a
    # noop sink unless overridden to a local twin
    return SinkSpec(name=name, format="noop")


def spec_from_native(
    doc: Mapping[str, Any],
    name: str = "native",
    sink_overrides: Mapping[str, Mapping[str, Any]] | None = None,
) -> tuple[PipelineSpec, list[str]]:
    """Translate a reference pipeline config (example_config/data_pipelines/
    *.yaml shape: ``inputs`` / ``processors`` / ``flushers``; loaders
    core/collection_pipeline/CollectionPipeline.cpp:76-120 and
    pluginmanager/logstore_config.go:306+) into a PipelineSpec.

    Returns (spec, input_paths): ``input_paths`` are the input_file FilePaths
    globs — read them with sources.files.read_log_files (offsets on when a
    multiline processor is present) and hand the DataFrame to run_pipeline.
    Every flusher receives every event (the reference's flusher fan-out when
    no router is configured), so the spec compiles in fanout mode with one
    unconditional route per sink. Network flushers map to noop sinks unless
    ``sink_overrides`` redirects them to a local twin."""
    sink_overrides = sink_overrides or {}
    processors = [_native_processor(p) for p in doc.get("processors", [])]
    sinks = [_native_sink(f, sink_overrides) for f in doc.get("flushers", [])]
    paths: list[str] = []
    for inp in doc.get("inputs", []):
        if inp.get("Type") in ("input_file", "input_static_file"):
            paths.extend(inp.get("FilePaths", []))
    spec = PipelineSpec(
        name=name,
        processors=processors,
        routes=[Route(sink=s.name, condition=None) for s in sinks],
        route_mode="fanout",
        default_sink=sinks[0].name if sinks else "default",
        shard_keys=(),
        tags={},
        sinks={s.name: s for s in sinks},
        metrics_tokens_col=None,
    )
    return spec, paths


def load_native_config(
    path: str,
    name: str | None = None,
    sink_overrides: Mapping[str, Mapping[str, Any]] | None = None,
) -> tuple[PipelineSpec, list[str]]:
    """Load an unmodified reference pipeline YAML/JSON → (spec, input paths)."""
    import os

    doc = _load_doc(path)
    return spec_from_native(
        doc,
        name=name or os.path.splitext(os.path.basename(path))[0],
        sink_overrides=sink_overrides,
    )
