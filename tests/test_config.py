"""Config loader: the reference's YAML/JSON pipeline shape → PipelineSpec."""

from __future__ import annotations

import json

from loongcollector_spark.config import load_spec, spec_from_dict

DOC = {
    "name": "nginx",
    "processors": [
        ["parse_regex", {"source_key": "line", "pattern": "(\\d+)", "keys": ["status"]}],
    ],
    "routes": [
        {"sink": "errors", "content_key": "status", "content_regex": "5\\d\\d"},
        {"sink": "tagged", "tag_key": "env", "tag_value": "prod", "discard_tag": True},
    ],
    "default_sink": "rest",
    "shard_keys": ["source"],
    "shard_count": 8,
    "tags": {"env": "prod"},
    "sinks": {"errors": {"format": "parquet", "path": "/tmp/x", "compression": "zstd"}},
}


def test_spec_from_dict():
    spec = spec_from_dict(DOC)
    assert spec.name == "nginx"
    assert spec.processors[0][0] == "parse_regex"
    assert spec.routes[0].sink == "errors"
    assert spec.routes[0].condition.content_regex == "5\\d\\d"
    assert spec.routes[1].condition.discard_tag is True
    assert spec.default_sink == "rest"
    assert spec.shard_count == 8
    assert spec.sinks["errors"].compression == "zstd"


def test_load_spec_json(tmp_path):
    p = tmp_path / "pipe.json"
    p.write_text(json.dumps(DOC))
    spec = load_spec(str(p))
    assert spec.name == "nginx" and len(spec.routes) == 2


def test_route_without_condition_always_matches():
    spec = spec_from_dict({"name": "x", "routes": [{"sink": "all"}]})
    assert spec.routes[0].condition is None
