"""processor_cloud_meta: mock-platform resolution (mirrors the reference's
MockManager unit tests, plugins/processor/cloudmeta/cloud_meta_test.go) and a
LIVE IMDS-style fetch against a local HTTP server speaking the ECS metadata
protocol — token handshake (aliyun_ecs.go:36-70,107-121), per-flag paths
(:171-192), tag-index enumeration, 404-as-skip."""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from loongcollector_spark.operators import platformmeta as pm


class _ImdsHandler(BaseHTTPRequestHandler):
    TOKEN = "tok-123"
    META = {
        "/latest/meta-data/instance-id": "i-bp1xxx",
        "/latest/meta-data/region-id": "cn-hangzhou",
        "/latest/meta-data/zone-id": "cn-hangzhou-b",
        "/latest/meta-data/vpc-id": "vpc-001",
        "/latest/meta-data/tags/instance/": "team\nenv",
        "/latest/meta-data/tags/instance/team": "data",
        "/latest/meta-data/tags/instance/env": "prod",
    }

    def do_PUT(self):
        if self.path == "/latest/api/token" and self.headers.get(
            "X-aliyun-ecs-metadata-token-ttl-seconds"
        ):
            self._ok(self.TOKEN)
        else:
            self._err(400)

    def do_GET(self):
        if self.headers.get("X-aliyun-ecs-metadata-token") != self.TOKEN:
            self._err(401)
        elif self.path in self.META:
            self._ok(self.META[self.path])
        else:
            self._err(404)

    def _ok(self, body: str):
        data = body.encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _err(self, code: int):
        self.send_response(code)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def imds_server():
    srv = HTTPServer(("127.0.0.1", 0), _ImdsHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_fetch_ecs_metadata_live(imds_server):
    meta = pm.fetch_ecs_metadata(
        [
            pm.FLAG_INSTANCE_ID,
            pm.FLAG_REGION,
            pm.FLAG_ZONE,
            pm.FLAG_VPC_ID,
            pm.FLAG_INSTANCE_NAME,  # 404 on this host -> skipped
            pm.FLAG_INSTANCE_TAGS,
        ],
        endpoint=imds_server,
        rename={pm.FLAG_REGION: "region"},
    )
    assert meta == {
        pm.FLAG_INSTANCE_ID: "i-bp1xxx",
        "region": "cn-hangzhou",
        pm.FLAG_ZONE: "cn-hangzhou-b",
        pm.FLAG_VPC_ID: "vpc-001",
        f"{pm.FLAG_INSTANCE_TAGS}_team": "data",
        f"{pm.FLAG_INSTANCE_TAGS}_env": "prod",
    }


def test_resolve_mock_platform_matches_reference_mock_manager():
    meta = pm.resolve_metadata(
        [pm.FLAG_INSTANCE_ID, pm.FLAG_REGION, pm.FLAG_INSTANCE_TAGS],
        platform="mock",
        rename={pm.FLAG_INSTANCE_TAGS: "tags"},
    )
    # mock.go values, tags renamed base + "_" + key (cloud_meta.go:180-189)
    assert meta == {
        pm.FLAG_INSTANCE_ID: "id_xxx",
        pm.FLAG_REGION: "region_xxx",
        "tags_tag_key": "tag_val",
    }


def test_resolve_requires_metadata_and_known_platform():
    with pytest.raises(ValueError, match="metadata is required"):
        pm.resolve_metadata([], platform="mock")
    with pytest.raises(ValueError, match="unsupported platform"):
        pm.resolve_metadata([pm.FLAG_REGION], platform="gcp")


def test_native_config_cloud_meta_e2e(spark, tmp_path, imds_server):
    """A native YAML block with Platform aliyun_ecs + local Endpoint runs the
    fetch at translate time and injects the fields through the pipeline."""
    from loongcollector_spark.config import spec_from_native
    from loongcollector_spark.pipeline import run_pipeline

    out_dir = str(tmp_path / "out")
    native = {
        "processors": [
            {
                "Type": "processor_cloud_meta",
                "Platform": "aliyun_ecs",
                "Endpoint": imds_server,
                "Metadata": ["__cloud_instance_id__", "__cloud_region__"],
                "RenameMetadata": {"__cloud_region__": "region"},
            }
        ],
        "flushers": [
            {"Type": "flusher_file", "FilePath": out_dir + "/x.json"},
        ],
    }
    spec, _paths = spec_from_native(
        native,
        name="cloudmeta-e2e",
        sink_overrides={"file": {"format": "parquet", "path": out_dir}},
    )
    assert spec.processors[0] == (
        "cloud_meta",
        {"metadata": {"__cloud_instance_id__": "i-bp1xxx", "region": "cn-hangzhou"}},
    )
    df = spark.createDataFrame([("hello",), ("world",)], "content string")
    run_pipeline(df, spec)
    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) == 2
    assert {(r["__cloud_instance_id__"], r["region"]) for r in rows} == {
        ("i-bp1xxx", "cn-hangzhou")
    }


def test_native_config_cloud_meta_jsonpath_rejected():
    from loongcollector_spark.config import _native_processor

    with pytest.raises(ValueError, match="JSONPath"):
        _native_processor(
            {"Type": "processor_cloud_meta", "JSONPath": "content.cloud",
             "Metadata": ["__cloud_region__"]}
        )
