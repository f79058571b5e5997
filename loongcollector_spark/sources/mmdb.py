"""Pure-Python MaxMind DB (.mmdb) reader for processor_geoip's DBPath.

The reference opens the configured database with geoip2.Open and answers
db.City(ip) longest-prefix lookups per event
(plugins/processor/geoip/processor_geoip.go:33-66,120-134). A per-row
point-lookup is the wrong shape for Spark; instead this module parses the
binary search tree ONCE at plan time into the list of (CIDR, record) rows
the existing /8-bucketed broadcast interval join consumes
(operators/enrich.py geo_cidr_lookup) — the longest-prefix semantics are
preserved because a MaxMind tree's leaf networks are non-overlapping by
construction (every IP reaches exactly one leaf).

Format: the public MaxMind DB spec v2.0 (https://maxmind.github.io/MaxMind-DB/)
— a binary search tree of fixed-width records, a 16-null-byte separator, a
typed data section, and a metadata map after the last
``\\xab\\xcd\\xefMaxMind.com`` marker. No external library is required.

Only IPv4 reachability is enumerated (the pipeline's geo joins are IPv4,
matching the reference's inetNtoa/ParseIP handling of dotted quads and
integer values). For ip_version=6 databases the IPv4 space lives under the
96-zero-bit prefix — enumeration descends those 96 left edges first, exactly
like a reader looking up an IPv4-mapped address.
"""

from __future__ import annotations

import struct
from typing import Any, Iterator

_METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"
_DATA_SEPARATOR_SIZE = 16

# pointer value-size base offsets from the spec: 1-byte pointers address
# 0..2047, 2-byte 2048..526335, 3-byte 526336..(2^27+526335), 4-byte raw
_POINTER_BASES = (0, 2048, 526336, 0)


class MMDBReader:
    """Minimal spec-complete decoder: metadata, search tree (record sizes
    24/28/32), data section (all spec types incl. pointers), and IPv4
    network enumeration."""

    def __init__(self, path: str):
        with open(path, "rb") as fh:
            self._buf = fh.read()
        idx = self._buf.rfind(_METADATA_MARKER)
        if idx < 0:
            raise ValueError(f"{path}: no MaxMind.com metadata marker — not an .mmdb file")
        meta, _ = self._decode(idx + len(_METADATA_MARKER), base=0)
        self.metadata: dict[str, Any] = meta
        self.node_count: int = meta["node_count"]
        self.record_size: int = meta["record_size"]
        self.ip_version: int = meta.get("ip_version", 4)
        if self.record_size not in (24, 28, 32):
            raise ValueError(f"unsupported record_size {self.record_size}")
        self._tree_size = (self.record_size * 2 // 8) * self.node_count
        self._data_start = self._tree_size + _DATA_SEPARATOR_SIZE

    # -- search tree -------------------------------------------------------

    def _record(self, node: int, side: int) -> int:
        """Record value of ``node``'s left (0) / right (1) child."""
        buf = self._buf
        if self.record_size == 24:
            off = node * 6 + side * 3
            return int.from_bytes(buf[off : off + 3], "big")
        if self.record_size == 28:
            off = node * 7
            mid = buf[off + 3]
            if side == 0:
                return ((mid >> 4) << 24) | int.from_bytes(buf[off : off + 3], "big")
            return ((mid & 0x0F) << 24) | int.from_bytes(buf[off + 4 : off + 7], "big")
        off = node * 8 + side * 4
        return int.from_bytes(buf[off : off + 4], "big")

    def _ipv4_root(self) -> int | None:
        """Start node for the IPv4 space: the root for ip_version=4, else the
        node reached by 96 zero bits (the ::/96 IPv4-mapped subtree)."""
        node = 0
        if self.ip_version == 6:
            for _ in range(96):
                node = self._record(node, 0)
                if node >= self.node_count:
                    return None  # v6-only database with no IPv4 subtree
        return node

    def networks(self) -> Iterator[tuple[str, dict]]:
        """Yield every IPv4 leaf as ("a.b.c.d/k", decoded record dict),
        depth-first — the exhaustive dump of db.City answers."""
        root = self._ipv4_root()
        if root is None:
            return
        # iterative DFS: (node, prefix_bits, depth)
        stack: list[tuple[int, int, int]] = [(root, 0, 0)]
        while stack:
            node, prefix, depth = stack.pop()
            for side in (1, 0):  # push right first → left-first emission
                rec = self._record(node, side)
                bits = (prefix << 1) | side
                if rec == self.node_count:
                    continue  # empty: no data under this branch
                if rec < self.node_count:
                    if depth + 1 > 32:
                        raise ValueError("IPv4 subtree deeper than 32 bits")
                    stack.append((rec, bits, depth + 1))
                    continue
                addr = bits << (32 - depth - 1)
                cidr = (
                    f"{(addr >> 24) & 255}.{(addr >> 16) & 255}."
                    f"{(addr >> 8) & 255}.{addr & 255}/{depth + 1}"
                )
                yield cidr, self._data_at(rec)

    def lookup(self, ip: str) -> dict | None:
        """Point lookup of a dotted-quad IPv4 (db.City analogue); used by
        tests to cross-check networks() enumeration."""
        parts = [int(x) for x in ip.split(".")]
        addr = (parts[0] << 24) | (parts[1] << 16) | (parts[2] << 8) | parts[3]
        node = self._ipv4_root()
        if node is None:
            return None
        for depth in range(32):
            node = self._record(node, (addr >> (31 - depth)) & 1)
            if node == self.node_count:
                return None
            if node > self.node_count:
                return self._data_at(node)
        return None

    def _data_at(self, record_value: int) -> dict:
        offset = record_value - self.node_count + self._tree_size
        if offset < self._data_start:
            raise ValueError(f"record value {record_value} points into the separator")
        value, _ = self._decode(offset, base=self._data_start)
        return value

    # -- data section ------------------------------------------------------

    def _decode(self, offset: int, base: int) -> tuple[Any, int]:
        """Decode one value at absolute ``offset``; pointers are relative to
        ``base`` (the data-section start)."""
        buf = self._buf
        ctrl = buf[offset]
        offset += 1
        type_num = ctrl >> 5
        if type_num == 0:  # extended type
            type_num = 7 + buf[offset]
            offset += 1

        if type_num == 1:  # pointer
            ss = (ctrl >> 3) & 0x3
            vbits = ctrl & 0x7
            if ss == 3:
                ptr = int.from_bytes(buf[offset : offset + 4], "big")
            else:
                ptr = (vbits << (8 * (ss + 1))) | int.from_bytes(
                    buf[offset : offset + ss + 1], "big"
                )
            ptr += _POINTER_BASES[ss]
            value, _ = self._decode(base + ptr, base)
            return value, offset + (4 if ss == 3 else ss + 1)

        size = ctrl & 0x1F
        if size == 29:
            size = 29 + buf[offset]
            offset += 1
        elif size == 30:
            size = 285 + int.from_bytes(buf[offset : offset + 2], "big")
            offset += 2
        elif size == 31:
            size = 65821 + int.from_bytes(buf[offset : offset + 3], "big")
            offset += 3

        if type_num == 2:  # utf8 string
            return buf[offset : offset + size].decode("utf-8"), offset + size
        if type_num == 3:  # double
            return struct.unpack(">d", buf[offset : offset + 8])[0], offset + 8
        if type_num == 4:  # bytes
            return bytes(buf[offset : offset + size]), offset + size
        if type_num in (5, 6, 9, 10):  # uint16/32/64/128
            return int.from_bytes(buf[offset : offset + size], "big"), offset + size
        if type_num == 7:  # map
            out: dict[str, Any] = {}
            for _ in range(size):
                key, offset = self._decode(offset, base)
                out[key], offset = self._decode(offset, base)
            return out, offset
        if type_num == 8:  # int32 (signed, big-endian, size 0-4)
            # the official readers zero-pad short encodings to 4 bytes before
            # the signed unpack (maxminddb decoder.py _decode_int32), so 0xFF
            # stored in 1 byte is 255, not -1; only a full 4-byte encoding
            # with the top bit set is negative
            v = int.from_bytes(buf[offset : offset + size], "big")
            if size == 4 and v >= 1 << 31:
                v -= 1 << 32
            return v, offset + size
        if type_num == 11:  # array
            arr = []
            for _ in range(size):
                item, offset = self._decode(offset, base)
                arr.append(item)
            return arr, offset
        if type_num == 12:  # data cache container (metadata-only)
            return None, offset
        if type_num == 13:  # end marker
            return None, offset
        if type_num == 14:  # boolean: size IS the value
            return bool(size), offset
        if type_num == 15:  # float
            return struct.unpack(">f", buf[offset : offset + 4])[0], offset + 4
        raise ValueError(f"unknown mmdb type {type_num} at offset {offset - 1}")


def geo_fields(record: dict, language: str) -> dict[str, Any]:
    """Flatten a City record into the reference's emitted values
    (ProcessGeoIP, processor_geoip.go:134-171): Names map indexed by the
    configured Language (a missing translation emits NO key — None here),
    Subdivisions[0] for province, IsoCode companions, float coordinates."""
    city = ((record.get("city") or {}).get("names") or {}).get(language)
    country_rec = record.get("country") or {}
    country = (country_rec.get("names") or {}).get(language)
    country_code = country_rec.get("iso_code", "") if country_rec.get("names") else None
    subs = record.get("subdivisions") or []
    province = province_code = None
    if subs and subs[0].get("names"):
        province = subs[0]["names"].get(language)
        # the code companion is appended whenever subdivisions carry names,
        # even if the configured language has no translation (:149-153)
        province_code = subs[0].get("iso_code", "")
    loc = record.get("location") or {}
    return {
        "city": city,
        "province": province,
        "province_code": province_code,
        "country": country,
        "country_code": country_code,
        # strconv.FormatFloat(x, 'f', 8, 64): fixed 8-decimal strings
        "longitude": "%.8f" % float(loc.get("longitude", 0.0)),
        "latitude": "%.8f" % float(loc.get("latitude", 0.0)),
    }


def mmdb_cidr_rows(path: str, language: str = "zh-CN") -> list[dict[str, Any]]:
    """Dump an .mmdb City database to broadcast-table rows:
    {"cidr": "a.b.c.d/k", city/province/province_code/country/country_code/
    longitude/latitude}. Feed to operators.enrich.geo_mmdb_lookup (which
    renames to the reference's ``{SourceKey}_city_`` style)."""
    reader = MMDBReader(path)
    rows = []
    for cidr, record in reader.networks():
        row = geo_fields(record, language)
        row["cidr"] = cidr
        rows.append(row)
    return rows
