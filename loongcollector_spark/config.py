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


def load_spec(path: str) -> PipelineSpec:
    """Load a pipeline spec from a JSON (or, if PyYAML is present, YAML) file."""
    with open(path) as fh:
        text = fh.read()
    if path.endswith((".yaml", ".yml")):
        try:
            import yaml  # optional dependency, like the reference's YAML support
        except ImportError as e:
            raise ImportError("YAML configs need PyYAML; use JSON instead") from e
        doc = yaml.safe_load(text)
    else:
        doc = json.loads(text)
    return spec_from_dict(doc)
