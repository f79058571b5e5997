"""processor_geoip with a real .mmdb database (processor_geoip.go:36-66).

The fixture writer (tests/mmdb_fixture.py) emits spec-v2.0 files; the
product reader (sources/mmdb.py) parses them into the broadcast CIDR table;
geo_mmdb_lookup reproduces ProcessGeoIP's output fields
({SourceKey}_city_/_province_/_province_code_/_country_/_country_code_/
_longitude_/_latitude_, processor_geoip.go:134-171)."""

import pytest

from loongcollector_spark.sources.mmdb import MMDBReader, mmdb_cidr_rows
from tests.mmdb_fixture import build_mmdb, city_record

NETWORKS = {
    # shared country strings across networks → data-section pointers
    "1.2.3.0/24": city_record(
        city_en="Hangzhou", city_zh="杭州",
        province=("ZJ", "Zhejiang", "浙江"),
        country=("CN", "China", "中国"), lat=30.25, lng=120.17,
    ),
    "1.2.0.0/16": None,  # replaced below: carve-out parent is illegal; use sibling
    "9.9.9.9/32": city_record(
        city_en="Berlin",  # no zh-CN city name → zh-CN lookup emits no city
        province=("BE", "Berlin", "柏林州"),
        country=("DE", "Germany", "德国"), lat=52.52, lng=13.40,
    ),
    "100.64.0.0/10": city_record(
        # no city/province/country names at all → only coordinates
        lat=0.0, lng=0.0,
    ),
    "1.2.4.0/24": city_record(
        city_en="Ningbo", city_zh="宁波",
        province=("ZJ", "Zhejiang", "浙江"),
        country=("CN", "China", "中国"), lat=29.87, lng=121.54,
    ),
}
del NETWORKS["1.2.0.0/16"]


@pytest.fixture(scope="module", params=[4, 6], ids=["ipv4-db", "ipv6-db"])
def db_path(request, tmp_path_factory):
    p = tmp_path_factory.mktemp("mmdb") / f"test-v{request.param}.mmdb"
    return build_mmdb(str(p), NETWORKS, ip_version=request.param)


def test_reader_networks_roundtrip(db_path):
    reader = MMDBReader(db_path)
    nets = dict(reader.networks())
    assert set(nets) == set(NETWORKS)
    assert nets["1.2.3.0/24"]["city"]["names"]["zh-CN"] == "杭州"
    assert nets["1.2.3.0/24"]["location"]["longitude"] == 120.17
    # pointer dedupe: the two CN networks share country name objects
    assert nets["1.2.4.0/24"]["country"]["names"]["en"] == "China"


def test_reader_point_lookup_matches_enumeration(db_path):
    reader = MMDBReader(db_path)
    assert reader.lookup("1.2.3.77")["city"]["names"]["en"] == "Hangzhou"
    assert reader.lookup("1.2.4.1")["city"]["names"]["en"] == "Ningbo"
    assert reader.lookup("9.9.9.9")["country"]["iso_code"] == "DE"
    assert reader.lookup("9.9.9.8") is None
    assert reader.lookup("100.127.255.255") is not None
    assert reader.lookup("8.8.8.8") is None


def test_cidr_rows_language_and_code_semantics(db_path):
    rows = {r["cidr"]: r for r in mmdb_cidr_rows(db_path, language="zh-CN")}
    hz = rows["1.2.3.0/24"]
    assert hz["city"] == "杭州" and hz["country"] == "中国"
    assert hz["province"] == "浙江" and hz["province_code"] == "ZJ"
    assert hz["country_code"] == "CN"
    assert hz["longitude"] == "120.17000000" and hz["latitude"] == "30.25000000"
    # Berlin has no zh-CN city name: city key absent (None), but the
    # province/country code companions still emit (processor_geoip.go:149-166)
    de = rows["9.9.9.9/32"]
    assert de["city"] is None and de["province"] == "柏林州"
    assert de["province_code"] == "BE" and de["country_code"] == "DE"
    # nameless record: only coordinates
    cg = rows["100.64.0.0/10"]
    assert cg["city"] is None and cg["country_code"] is None
    assert cg["longitude"] == "0.00000000"


def test_geo_mmdb_lookup_operator(spark, db_path):
    from loongcollector_spark.operators.enrich import geo_mmdb_lookup

    df = spark.createDataFrame(
        [("1.2.3.50",), ("9.9.9.9",), ("8.8.8.8",), ("not-an-ip",), (None,)],
        "ip string",
    )
    out = geo_mmdb_lookup(df, "ip", db_path).collect()
    by_ip = {r["ip"]: r for r in out}
    assert len(out) == 5
    hz = by_ip["1.2.3.50"]
    assert hz["ip_city_"] == "杭州" and hz["ip_country_code_"] == "CN"
    assert hz["ip_longitude_"] == "120.17000000"
    # matched but no zh-CN city translation
    assert by_ip["9.9.9.9"]["ip_city_"] is None
    assert by_ip["9.9.9.9"]["ip_province_code_"] == "BE"
    # parseable miss: db.City zero record → coordinates 0 (go zero values)
    assert by_ip["8.8.8.8"]["ip_country_"] is None
    assert by_ip["8.8.8.8"]["ip_longitude_"] == "0.00000000"
    # unparseable: ParseIP nil → early return, NO fields at all
    assert by_ip["not-an-ip"]["ip_longitude_"] is None
    assert by_ip[None]["ip_longitude_"] is None


def test_geo_mmdb_lookup_flags_and_ip_value(spark, db_path):
    from loongcollector_spark.operators.enrich import geo_mmdb_lookup

    # IPValueFlag: value is the IP as network-order uint32 (inetNtoa)
    ip_int = str((1 << 24) | (2 << 16) | (3 << 8) | 50)
    df = spark.createDataFrame([(ip_int,), ("garbage",)], "ip string")
    out = geo_mmdb_lookup(
        df, "ip", db_path, language="en", ip_value_flag=True,
        no_city=False, no_province=True, keep_source=False,
    )
    assert "ip" not in out.columns and "ip_province_" not in out.columns
    rows = out.collect()
    got = {r["ip_city_"] for r in rows}
    assert got == {"Hangzhou", None}
    # Atoi("garbage") → 0 → 0.0.0.0: valid IP, miss → zero coordinates
    assert {r["ip_longitude_"] for r in rows} == {"120.17000000", "0.00000000"}


def test_native_config_geoip_e2e(spark, db_path, tmp_path):
    """A native YAML config pointing DBPath at the fixture runs unmodified
    through the batch runner (VERDICT r4 #3 done-criterion)."""
    import yaml

    from loongcollector_spark.config import load_native_config
    from loongcollector_spark.pipeline import compile_pipeline

    cfg = {
        "processors": [
            {
                "Type": "processor_geoip",
                "SourceKey": "client_ip",
                "DBPath": db_path,
                "Language": "zh-CN",
                "NoCoordinate": True,
            }
        ],
        "flushers": [{"Type": "flusher_stdout"}],
    }
    cfg_path = tmp_path / "geoip.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    spec, _paths = load_native_config(str(cfg_path))
    assert spec.processors[0][0] == "geo_mmdb_lookup"
    df = spark.createDataFrame([("1.2.4.9",), ("8.8.8.8",)], "client_ip string")
    got = {r["client_ip"]: r for r in compile_pipeline(df, spec).collect()}
    assert got["1.2.4.9"]["client_ip_city_"] == "宁波"
    assert got["1.2.4.9"]["client_ip_country_"] == "中国"
    assert got["8.8.8.8"]["client_ip_city_"] is None
    assert "client_ip_longitude_" not in got["1.2.4.9"].asDict()


def test_int32_short_encodings_zero_pad():
    """int32 values stored in fewer than 4 bytes are ZERO-PADDED before the
    signed unpack (official maxminddb decoder parity): 0xFF in one byte is
    255, not -1; only a full 4-byte encoding can be negative."""
    r = object.__new__(MMDBReader)
    cases = [
        (b"\x01\x01\xff", 255),                    # 1-byte 0xFF -> 255
        (b"\x02\x01\x80\x00", 0x8000),             # 2-byte high bit -> positive
        (b"\x00\x01", 0),                          # 0-byte -> 0
        (b"\x04\x01\xff\xff\xff\xff", -1),         # full 4 bytes -> signed
        (b"\x04\x01\x7f\xff\xff\xff", 2**31 - 1),  # max positive
    ]
    for raw, want in cases:
        r._buf = raw
        got, end = r._decode(0, base=0)
        assert got == want, raw
        assert end == len(raw)
