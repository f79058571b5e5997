"""Minimal MaxMind DB (.mmdb) WRITER for test fixtures.

Emits spec-v2.0 files (https://maxmind.github.io/MaxMind-DB/) the product
reader (loongcollector_spark/sources/mmdb.py) and the reference's
geoip2-golang both accept: 24-bit records, a binary search tree over the
given CIDRs, a deduplicated data section (repeat strings become pointers —
exercising the reader's pointer path the way real GeoLite2 files do), the
16-null-byte separator, and a metadata map after the marker. Test-only: the
product never writes .mmdb."""

from __future__ import annotations

import struct


def _encode_uint(type_num: int, value: int) -> bytes:
    body = b"" if value == 0 else value.to_bytes((value.bit_length() + 7) // 8, "big")
    return _ctrl(type_num, len(body)) + body


def _ctrl(type_num: int, size: int) -> bytes:
    assert size < 285, "fixture encoder: small sizes only"
    if size < 29:
        first, extra = size, b""
    else:
        first, extra = 29, bytes([size - 29])
    if type_num <= 7:
        return bytes([(type_num << 5) | first]) + extra
    # spec order: control byte, extended-type byte, THEN extra size bytes
    return bytes([first]) + bytes([type_num - 7]) + extra


def _encode_pointer(offset: int) -> bytes:
    if offset < 2048:
        return bytes([(1 << 5) | ((offset >> 8) & 0x7), offset & 0xFF])
    v = offset - 2048
    return bytes([(1 << 5) | (1 << 3) | ((v >> 16) & 0x7)]) + (v & 0xFFFF).to_bytes(2, "big")


class _DataSection:
    """Encoder with GeoLite2-style string deduplication: every string value
    is hoisted into the buffer once and referenced by pointer from its
    containers (dedupe=True, the data section — exercises the reader's
    pointer path); metadata encodes strings inline (the spec's metadata map
    has no data-section base for pointers to resolve against)."""

    def __init__(self, dedupe: bool) -> None:
        self.buf = bytearray()
        self._dedupe = dedupe
        self._strings: dict[str, int] = {}

    def write(self, value: dict) -> int:
        """Append one container record; returns its data-section offset
        (nested strings may be hoisted in FRONT of it — the returned offset
        is the container's own control byte, what a tree record points at)."""
        raw = self._encode(value, top=True)
        offset = len(self.buf)
        self.buf += raw
        return offset

    def _encode(self, value, top: bool = False) -> bytes:
        if isinstance(value, str):
            raw = value.encode("utf-8")
            inline = _ctrl(2, len(raw)) + raw
            if not self._dedupe or top:
                return inline
            if value not in self._strings:
                self._strings[value] = len(self.buf)
                self.buf += inline  # hoist: lands before the parent container
            return _encode_pointer(self._strings[value])
        if isinstance(value, bool):
            return _ctrl(14, int(value))
        if isinstance(value, int):
            if value < 1 << 16:
                return _encode_uint(5, value)
            if value < 1 << 32:
                return _encode_uint(6, value)
            return _encode_uint(9, value)
        if isinstance(value, float):
            return _ctrl(3, 8) + struct.pack(">d", value)
        if isinstance(value, dict):
            out = b""
            for k, v in value.items():
                out += self._encode(k) + self._encode(v)
            return _ctrl(7, len(value)) + out
        if isinstance(value, list):
            out = b""
            for v in value:
                out += self._encode(v)
            return _ctrl(11, len(value)) + out
        raise TypeError(f"fixture encoder: unsupported {type(value)}")


def build_mmdb(
    path: str,
    networks: dict[str, dict],
    ip_version: int = 4,
    database_type: str = "GeoLite2-City",
    languages: tuple[str, ...] = ("en", "zh-CN"),
    build_epoch: int = 1735689600,  # fixed: fixture bytes are deterministic
) -> str:
    """Write an .mmdb with the given {"a.b.c.d/k": city-record} networks."""
    data = _DataSection(dedupe=True)
    data_offsets: dict[str, int] = {}
    for cidr, record in networks.items():
        data_offsets[cidr] = data.write(record)

    # binary trie: each node [left, right]; entries are None (empty),
    # ("node", idx), or ("data", offset)
    nodes: list[list] = [[None, None]]

    def insert(bits: int, depth: int, total_bits: int, cidr: str) -> None:
        node = 0
        for i in range(depth):
            side = (bits >> (depth - 1 - i)) & 1
            if i == depth - 1:
                nodes[node][side] = ("data", data_offsets[cidr])
                return
            nxt = nodes[node][side]
            if nxt is None:
                nodes.append([None, None])
                nodes[node][side] = ("node", len(nodes) - 1)
                node = len(nodes) - 1
            elif nxt[0] == "node":
                node = nxt[1]
            else:
                raise ValueError(f"{cidr} nests inside another fixture network")

    for cidr in networks:
        base, k = cidr.split("/")
        k = int(k)
        o = [int(x) for x in base.split(".")]
        addr = (o[0] << 24) | (o[1] << 16) | (o[2] << 8) | o[3]
        bits = addr >> (32 - k)
        if ip_version == 6:
            # IPv4 space under ::/96 — 96 leading zero bits
            insert(bits, 96 + k, 128, cidr)
        else:
            insert(bits, k, 32, cidr)

    node_count = len(nodes)

    def record_value(entry) -> int:
        if entry is None:
            return node_count
        if entry[0] == "node":
            return entry[1]
        return entry[1] + node_count + 16

    tree = bytearray()
    for left, right in nodes:
        tree += record_value(left).to_bytes(3, "big")
        tree += record_value(right).to_bytes(3, "big")

    meta = _DataSection(dedupe=False)
    meta.write(
        {
            "binary_format_major_version": 2,
            "binary_format_minor_version": 0,
            "node_count": node_count,
            "record_size": 24,
            "ip_version": ip_version,
            "database_type": database_type,
            "languages": list(languages),
            "build_epoch": build_epoch,
            "description": {"en": "loongcollector_spark test fixture"},
        }
    )

    with open(path, "wb") as fh:
        fh.write(bytes(tree))
        fh.write(b"\x00" * 16)
        fh.write(bytes(data.buf))
        fh.write(b"\xab\xcd\xefMaxMind.com")
        fh.write(bytes(meta.buf))
    return path


def city_record(
    city_en: str | None = None,
    city_zh: str | None = None,
    province: tuple[str, str, str] | None = None,  # (iso, en, zh)
    country: tuple[str, str, str] | None = None,  # (iso, en, zh)
    lat: float = 0.0,
    lng: float = 0.0,
) -> dict:
    rec: dict = {"location": {"latitude": lat, "longitude": lng}}
    if city_en or city_zh:
        names = {}
        if city_en:
            names["en"] = city_en
        if city_zh:
            names["zh-CN"] = city_zh
        rec["city"] = {"names": names}
    if province:
        iso, en, zh = province
        rec["subdivisions"] = [{"iso_code": iso, "names": {"en": en, "zh-CN": zh}}]
    if country:
        iso, en, zh = country
        rec["country"] = {"iso_code": iso, "names": {"en": en, "zh-CN": zh}}
    return rec
