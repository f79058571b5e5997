"""Cloud platform metadata for processor_cloud_meta — the plan-time twin of
the reference's platformmeta managers.

Reference parity:
- flag names / per-flag metadata endpoints:
  pkg/helper/platformmeta/interface.go:18-28,
  pkg/helper/platformmeta/aliyun_ecs.go:171-192
- token handshake (PUT /latest/api/token with the ttl-seconds header, then
  GET with X-aliyun-ecs-metadata-token): aliyun_ecs.go:36-70,107-121
- mock manager values (unit-test platform): pkg/helper/platformmeta/mock.go
- rename + tags key layout (``<name>_<tagkey>``) and the read-once contract:
  plugins/processor/cloudmeta/cloud_meta.go:141-207

Spark-first shape: metadata describes the DRIVER's host (or a configured
endpoint), so it is fetched ONCE at plan time and injected as literal
columns — the columnar analogue of ReadOnce=true, and the only coherent
semantics for a distributed plan (per-executor fetches would tag rows with
whichever worker touched them). The fetch itself is stdlib urllib with the
reference's 1s timeout and one retry, never anything per-row.
"""

from __future__ import annotations

import urllib.error
import urllib.request
from collections.abc import Mapping, Sequence

FLAG_INSTANCE_ID = "__cloud_instance_id__"
FLAG_INSTANCE_NAME = "__cloud_instance_name__"
FLAG_REGION = "__cloud_region__"
FLAG_ZONE = "__cloud_zone__"
FLAG_VPC_ID = "__cloud_vpc_id__"
FLAG_VSWITCH_ID = "__cloud_vswitch_id__"
FLAG_INSTANCE_TAGS = "__cloud_instance_tags__"
FLAG_INSTANCE_TYPE = "__cloud_instance_type__"
FLAG_IMAGE_ID = "__cloud_image_id__"
FLAG_MAX_INGRESS = "__cloud_max_ingress__"
FLAG_MAX_EGRESS = "__cloud_max_egress__"

# flag -> metadata path under /latest (aliyun_ecs.go:171-191)
_FLAG_PATHS = {
    FLAG_INSTANCE_ID: "/meta-data/instance-id",
    FLAG_REGION: "/meta-data/region-id",
    FLAG_ZONE: "/meta-data/zone-id",
    FLAG_IMAGE_ID: "/meta-data/instance/image-id",
    FLAG_INSTANCE_TYPE: "/meta-data/instance/instance-type",
    FLAG_MAX_EGRESS: "/meta-data/instance/max-netbw-egress",
    FLAG_MAX_INGRESS: "/meta-data/instance/max-netbw-ingress",
    FLAG_INSTANCE_NAME: "/meta-data/instance/instance-name",
    FLAG_VSWITCH_ID: "/meta-data/vswitch-id",
    FLAG_VPC_ID: "/meta-data/vpc-id",
}
_TAGS_PATH = "/meta-data/tags/instance/"

# mock.go:28-70 — the reference's unit-test platform, mirrored verbatim so a
# config with Platform: mock produces identical fields in both engines
_MOCK_META = {
    FLAG_INSTANCE_ID: "id_xxx",
    FLAG_INSTANCE_NAME: "name_xxx",
    FLAG_REGION: "region_xxx",
    FLAG_ZONE: "zone_xxx",
    FLAG_VPC_ID: "vpc_xxx",
    FLAG_VSWITCH_ID: "vswitch_xxx",
    FLAG_INSTANCE_TYPE: "type_xxx",
    FLAG_IMAGE_ID: "image_xxx",
    FLAG_MAX_INGRESS: "0",
    FLAG_MAX_EGRESS: "0",
}
_MOCK_TAGS = {"tag_key": "tag_val"}


def _request(
    url: str, method: str, headers: Mapping[str, str], timeout: float
) -> str | None:
    """One metadata request; None maps the reference's error404 (missing
    key on this platform — silently skipped, aliyun_ecs.go:50-52)."""
    req = urllib.request.Request(url, method=method, headers=dict(headers))
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.read().decode("utf-8", "replace")
    except urllib.error.HTTPError as e:
        if e.code == 404:
            return None
        raise


def _read_meta_val(endpoint: str, api: str, token: str, timeout: float) -> str | None:
    err: Exception | None = None
    for _ in range(2):  # one retry, AlibabaCloudEcsPlatformReadMetaVal
        try:
            return _request(
                endpoint + "/latest" + api,
                "GET",
                {"X-aliyun-ecs-metadata-token": token},
                timeout,
            )
        except Exception as e:  # noqa: BLE001 — retry any transport error once
            err = e
    raise RuntimeError(f"cloud_meta: read {api} failed: {err}")


def fetch_ecs_metadata(
    metadata: Sequence[str],
    endpoint: str = "http://100.100.100.200",
    rename: Mapping[str, str] | None = None,
    token_ttl_seconds: int = 300,
    timeout: float = 1.0,
) -> dict[str, str]:
    """The ECS IMDSv2-style fetch: token handshake then one GET per requested
    flag; tags are enumerated from the tags index path and fetched per key.
    Returns the (renamed) flat metadata map ready for ``enrich.cloud_meta``."""
    rename = dict(rename or {})
    token = None
    err: Exception | None = None
    for _ in range(2):  # fetchToken retries twice (aliyun_ecs.go:107-115)
        try:
            token = _request(
                endpoint + "/latest/api/token",
                "PUT",
                {"X-aliyun-ecs-metadata-token-ttl-seconds": str(token_ttl_seconds)},
                timeout,
            )
            break
        except Exception as e:  # noqa: BLE001
            err = e
    if token is None:
        raise RuntimeError(f"cloud_meta: token fetch failed: {err}")

    meta: dict[str, str] = {}
    for flag in metadata:
        if flag == FLAG_INSTANCE_TAGS:
            index = _read_meta_val(endpoint, _TAGS_PATH, token, timeout)
            base = rename.get(flag, flag)
            for key in (index or "").splitlines():
                key = key.strip()
                if not key:
                    continue
                val = _read_meta_val(endpoint, _TAGS_PATH + key, token, timeout)
                if val is not None:
                    meta[f"{base}_{key}"] = val
            continue
        path = _FLAG_PATHS.get(flag)
        if path is None:
            continue  # unknown flags are skipped (readMeta's switch default)
        val = _read_meta_val(endpoint, path, token, timeout)
        if val is not None:
            meta[rename.get(flag, flag)] = val
    return meta


def resolve_metadata(
    metadata: Sequence[str],
    platform: str = "mock",
    endpoint: str | None = None,
    rename: Mapping[str, str] | None = None,
) -> dict[str, str]:
    """Resolve the processor_cloud_meta metadata map for a platform:
    ``mock`` (reference mock manager values), ``aliyun_ecs`` (live IMDS
    fetch; ``endpoint`` overrides the magic IP for tests)."""
    if not metadata:
        raise ValueError("cloud_meta: metadata is required (cloud_meta.go:62-65)")
    rename = dict(rename or {})
    if platform == "aliyun_ecs":
        return fetch_ecs_metadata(
            metadata, endpoint or "http://100.100.100.200", rename
        )
    if platform != "mock":
        raise ValueError(
            f"cloud_meta: unsupported platform {platform!r} "
            "(supported: mock, aliyun_ecs; the reference's other managers "
            "are per-cloud HTTP endpoints of the same shape)"
        )
    meta: dict[str, str] = {}
    for flag in metadata:
        if flag == FLAG_INSTANCE_TAGS:
            base = rename.get(flag, flag)
            for k, v in _MOCK_TAGS.items():
                meta[f"{base}_{k}"] = v
        elif flag in _MOCK_META:
            meta[rename.get(flag, flag)] = _MOCK_META[flag]
    return meta
