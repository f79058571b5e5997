"""SPL subset compiler — cases mirror core/unittest/spl/SplUnittest.cpp.

Reference coverage table (VERDICT r4 #6). Every SplUnittest.cpp case and
every construct family from the benchmark corpus spl.txt is either mirrored
by a green test here or explicitly mapped N/A:

| reference case (core/unittest/spl/)            | here                                        |
|-------------------------------------------------|---------------------------------------------|
| TestInit (:73, commented out upstream)          | test_spl_init_quota_contract                 |
| TestWhere (:92)                                 | test_spl_where                               |
| TestExtend json_extract (:149)                  | test_spl_extend_json_extract                 |
| TestJsonParse (:197)                            | test_spl_parse_json_dynamic_keys             |
| TestRegexParse (:266)                           | test_spl_parse_regexp                        |
| TestRegexCSV (:337)                             | test_spl_parse_csv                           |
| TestRegexKV (:413)                              | test_spl_parse_kv_regexp_and_delims          |
| TestTag project-rename "__tag__:x" (:488)       | test_spl_project_rename_and_chain — column   |
|                                                  | rename only; the reference ALSO re-groups    |
|                                                  | events by tag value (logGroupList.size()==2),|
|                                                  | which is group-buffer mechanics Spark doesn't|
|                                                  | need: N/A (grouping is a groupBy downstream) |
| TestMultiParse .let/$ref branches (:560,        | test_spl_multi_statement_branches            |
|   commented out upstream)                       |                                              |
| TestZeroTime date_parse/to_unixtime/cast (:655) | test_spl_date_parse_time_chain               |
| spl.txt: parse-regexp (?P<name>) w/o `as`       | test_spl_parse_regexp_named_groups           |
| spl.txt: parse-json -prefix= / -path=           | test_spl_parse_json_prefix_and_path          |
| spl.txt: parse-csv -delim/-quote/-strict        | test_spl_parse_csv_flags                     |
| spl.txt: parse-kv -kv-sep/-prefix/-mode         | test_spl_parse_kv_flags                      |
| SplBenchmark.cpp throughput loops               | N/A here — covered by bench.py spl_* queries |

Anything else in the closed prebuilt SPL engine (full Presto function
surface) remains a declared subset (operators/spl.py module docstring)."""

from __future__ import annotations

import pytest

from loongcollector_spark.operators.spl import SplError, compile_spl


def lines(spark, *vals):
    return spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, content string")


def test_spl_where(spark):
    # SplUnittest TestWhere: "* | where content='value_3_0'"
    df = lines(spark, "value_1_0", "value_3_0", "value_3_0")
    out = compile_spl(df, "* | where content='value_3_0'")
    assert out.count() == 2


def test_spl_extend_json_extract(spark):
    # TestExtend: json_extract over nested body -> "1"/"2" as JSON text
    df = lines(spark, '{"body": {"a": 1, "b": 2}}')
    out = compile_spl(
        df, "* | extend a=json_extract(content, '$.body.a'), b=json_extract(content, '$.body.b')"
    )
    r = out.first()
    assert r.a == "1" and r.b == "2"


def test_spl_parse_json_dynamic_keys(spark):
    # TestJsonParse: per-row key sets union into columns, absent -> null
    df = lines(spark, '{"a1":"bbbb","c":"d"}', '{"a1":"ccc","c1":"d1"}')
    out = compile_spl(df, "* | parse-json content ")
    rows = {r.id: r for r in out.collect()}
    assert rows[0].a1 == "bbbb" and rows[0].c == "d" and rows[0].c1 is None
    assert rows[1].a1 == "ccc" and rows[1].c1 == "d1" and rows[1].c is None


def test_spl_parse_regexp(spark):
    # TestRegexParse: '(\S+)\s+(\w+)' as ip, method
    df = lines(spark, "10.0.0.1 GET /index", "10.0.0.2 POST /form")
    out = compile_spl(df, r"* | parse-regexp content, '(\S+)\s+(\w+)' as ip, method")
    rows = {r.id: r for r in out.collect()}
    assert rows[0].ip == "10.0.0.1" and rows[0].method == "GET"
    assert rows[1].ip == "10.0.0.2" and rows[1].method == "POST"


def test_spl_parse_csv(spark):
    # TestCsvParse: parse-csv content as x, y, z
    df = lines(spark, "a,b,c", '1,"q,uoted",3')
    out = compile_spl(df, "* | parse-csv content as x, y, z")
    rows = {r.id: r for r in out.collect()}
    assert (rows[0].x, rows[0].y, rows[0].z) == ("a", "b", "c")
    assert (rows[1].x, rows[1].y, rows[1].z) == ("1", "q,uoted", "3")


def test_spl_parse_kv_regexp_and_delims(spark):
    # TestParseKv: -regexp '(\w+)=(\w+)' over k1=v1&k2=v2?k3=v3
    df = lines(spark, "k1=v1&k2=v2?k3=v3")
    out = compile_spl(df, r"* | parse-kv -regexp content, '(\w+)=(\w+)'")
    r = out.first()
    assert (r.k1, r.k2, r.k3) == ("v1", "v2", "v3")
    out2 = compile_spl(df, "* | parse-kv -delims='&?' content")
    r2 = out2.first()
    assert (r2.k1, r2.k2, r2.k3) == ("v1", "v2", "v3")


def test_spl_project_rename_and_chain(spark):
    # TestTag-ish: parse-json | project-rename "__tag__:taiye2"=a1
    df = lines(spark, '{"a1":"x"}')
    out = compile_spl(df, '* | parse-json content | project-rename "__tag__:taiye2"=a1')
    assert out.first()["__tag__:taiye2"] == "x"


def test_spl_date_parse_time_chain(spark):
    # SplUnittest time chain: date_parse + to_unixtime + cast + project-away
    df = lines(spark, '{"time":"2024-02-01T10:30:00","k":"v"}')
    out = compile_spl(
        df,
        "* | parse-json content "
        "| extend ts=date_parse(time, '%Y-%m-%dT%H:%i:%S')"
        "| extend __time__=cast(to_unixtime(ts) as INTEGER)-28800"
        "| project-away ts| project-away content",
    )
    r = out.first()
    assert "content" not in out.columns and "ts" not in out.columns
    import calendar

    expected = calendar.timegm((2024, 2, 1, 10, 30, 0)) - 28800
    assert r["__time__"] == expected


def test_spl_rejects_multi_statement(spark):
    df = lines(spark, "x")
    with pytest.raises(SplError):
        compile_spl(df, "* | where content='a'; * | where content='b'")
    with pytest.raises(SplError):
        compile_spl(df, "* | sort content")


def test_spl_concat_operator_and_quoted_as(spark):
    # '||' must not split stages; a quoted regex containing ' as ' must not
    # terminate the parse-regexp pattern early
    df = lines(spark, "x as y")
    out = compile_spl(df, "* | extend joined = content || '!' | parse-regexp content, '(\\w+) as (\\w+)' as left, right")
    r = out.first()
    assert r.joined == "x as y!"
    assert (r.left, r.right) == ("x", "y")


# --- round 3: explicit keys, sampled discovery, multi-statement ------------------


def test_spl_parse_json_explicit_keys_no_discovery(spark, monkeypatch):
    """'parse-json col as k1, k2' must build the plan with ZERO discovery
    jobs — the 100 TB path (keys are part of the plan, like the reference's
    per-config field lists)."""
    from loongcollector_spark.operators import spl as spl_mod

    def boom(*a, **k):  # pragma: no cover - should never run
        raise AssertionError("discovery job ran despite explicit keys")

    monkeypatch.setattr(spl_mod, "_discover_json_keys", boom)
    df = lines(spark, '{"a1":"x","c":"d"}', '{"a1":"y"}')
    out = compile_spl(df, "* | parse-json content as a1, missing")
    rows = out.orderBy("id").collect()
    assert [r.a1 for r in rows] == ["x", "y"]
    # explicitly-listed-but-absent key projects as null (per-row contract)
    assert all(r.missing is None for r in rows)
    # 'c' was NOT discovered — proof no discovery scan happened
    assert "c" not in out.columns


def test_spl_parse_kv_explicit_keys(spark):
    df = lines(spark, "k1=v1&k2=v2?k3=v3")
    out = compile_spl(df, "* | parse-kv -delims='&?' content as k1, k3")
    r = out.first()
    assert (r.k1, r.k3) == ("v1", "v3")
    assert "k2" not in out.columns


def test_spl_sampled_discovery(spark):
    """sample_rows bounds the discovery scan; keys only in later rows are
    missed — documented trade-off of the sampled mode."""
    df = lines(spark, '{"early":"1"}', '{"early":"2","late":"3"}')
    full = compile_spl(df, "* | parse-json content")
    assert {"early", "late"} <= set(full.columns)
    sampled = compile_spl(df, "* | parse-json content", sample_rows=1)
    assert "early" in sampled.columns and "late" not in sampled.columns


def test_spl_multi_statement_branches(spark):
    """Mirrors SplUnittest.cpp TestMultiParse: .let bindings + $ref emission,
    two result branches with independent parse stages."""
    from loongcollector_spark.operators.spl import compile_spl_multi

    df = lines(
        spark,
        '{"type":"kv","message":"k1=v1&k2=v2?k3=v3"}',
        '{"type":"csv","message":"a,b,c"}',
    )
    script = """.let src = * | parse-json content as type, message;
.let ds1 = $src | where type = 'kv' | parse-kv -delims='&?' message as k1, k2, k3;
$ds1;
.let ds2 = $src | where type = 'csv' | parse-csv message as x, y, z;
$ds2;
"""
    branches = compile_spl_multi(df, script)
    assert [n for n, _ in branches] == ["ds1", "ds2"]
    named = dict(branches)
    r1 = named["ds1"].first()
    assert (r1.k1, r1.k2, r1.k3) == ("v1", "v2", "v3")
    r2 = named["ds2"].first()
    assert (r2.x, r2.y, r2.z) == ("a", "b", "c")
    assert named["ds1"].count() == 1 and named["ds2"].count() == 1


def test_spl_multi_statement_anonymous_and_extra_stages(spark):
    from loongcollector_spark.operators.spl import compile_spl_multi

    df = lines(spark, "a", "b", "c")
    branches = compile_spl_multi(
        df,
        ".let all = * | extend n = 1; $all | where content <> 'a'; * | limit 1;",
    )
    assert [n for n, _ in branches] == ["all", "result1"]
    assert branches[0][1].count() == 2
    assert branches[1][1].count() == 1


def test_spl_multi_statement_errors(spark):
    from loongcollector_spark.operators.spl import compile_spl_multi

    df = lines(spark, "a")
    with pytest.raises(SplError, match="undefined"):
        compile_spl_multi(df, "$nope;")
    with pytest.raises(SplError, match="no result branch"):
        compile_spl_multi(df, ".let x = * | limit 1;")
    with pytest.raises(SplError, match="compile_spl_multi"):
        compile_spl(df, "* | limit 1; * | limit 2;")


def test_spl_stats_by(spark):
    df = lines(spark, "a", "a", "b")
    out = compile_spl(
        df, "* | stats count() as n, min(id) as first_id by content | sort by content"
    )
    rows = [(r.content, r.n, r.first_id) for r in out.collect()]
    assert rows == [("a", 2, 0), ("b", 1, 2)]


def test_spl_stats_global_and_sort_desc(spark):
    df = lines(spark, "x", "y", "z")
    assert compile_spl(df, "* | stats count() as n").first().n == 3
    out = compile_spl(df, "* | sort by id desc | limit 2")
    assert [r.id for r in out.collect()] == [2, 1]


def test_spl_stats_errors(spark):
    df = lines(spark, "a")
    with pytest.raises(SplError, match="as"):
        compile_spl(df, "* | stats count() by content")
    with pytest.raises(SplError, match="sort"):
        compile_spl(df, "* | sort")


def test_spl_init_quota_contract(spark):
    """ProcessorSPL::Init fidelity (ProcessorSPL.cpp:35-101): Script
    mandatory + query-size cap reject the config; TimeoutMilliSeconds /
    MaxMemoryBytes warn-and-default on invalid values (never abort)."""
    from loongcollector_spark.operators.spl import (
        SPL_DEFAULT_MAX_MEMORY_BYTES,
        SPL_DEFAULT_TIMEOUT_MILLS,
        SPL_QUERY_MAX_SIZE,
        compile_spl_multi,
        validate_spl_config,
    )

    with pytest.raises(SplError, match="Script is missing"):
        validate_spl_config({})
    with pytest.raises(SplError, match="Script is missing"):
        validate_spl_config({"Script": "   "})
    with pytest.raises(SplError, match="query_max_size"):
        validate_spl_config({"Script": "* | where " + "x" * SPL_QUERY_MAX_SIZE})

    # warn-default semantics: invalid quota values normalize, never raise
    got = validate_spl_config(
        {"Script": "* | limit 1", "TimeoutMilliSeconds": "abc", "MaxMemoryBytes": -5}
    )
    assert got["timeout_mills"] == SPL_DEFAULT_TIMEOUT_MILLS
    assert got["max_memory_bytes"] == SPL_DEFAULT_MAX_MEMORY_BYTES
    got = validate_spl_config(
        {"Script": "* | limit 1", "TimeoutMilliSeconds": 250, "MaxMemoryBytes": "1024"}
    )
    assert (got["timeout_mills"], got["max_memory_bytes"]) == (250, 1024)

    # the size cap also guards direct compile entry points
    df = lines(spark, "x")
    big = "* | where content != '" + "y" * SPL_QUERY_MAX_SIZE + "'"
    with pytest.raises(SplError, match="too large"):
        compile_spl(df, big)
    with pytest.raises(SplError, match="too large"):
        compile_spl_multi(df, big)


def test_spl_native_config_translation(spark):
    """A reference processor_spl block translates through the native table
    (Init-validated) and runs; a Script-less block is rejected at load."""
    from loongcollector_spark.config import _native_processor

    name, params = _native_processor(
        {"Type": "processor_spl", "Script": "* | extend up = upper(content)"}
    )
    assert name == "spl"
    from loongcollector_spark.pipeline import PROCESSORS

    out = PROCESSORS[name](lines(spark, "abc"), **params)
    assert out.first().up == "ABC"

    with pytest.raises(SplError):
        _native_processor({"Type": "processor_spl"})


# --- round 5: spl.txt flag families -------------------------------------------


def test_spl_parse_regexp_named_groups(spark):
    # spl.txt:4 — (?P<name>) groups carry the keys, no `as` clause
    df = lines(spark, "10.0.0.1 GET /index.html")
    out = compile_spl(df, r"* | parse-regexp content, '(?P<ip>\S+)\s+(?P<method>\w+)'")
    r = out.first()
    assert (r.ip, r.method) == ("10.0.0.1", "GET")
    # a pattern with no named groups and no `as` is a config error
    with pytest.raises(SplError):
        compile_spl(df, r"* | parse-regexp content, '(\S+)'")


def test_spl_parse_json_prefix_and_path(spark):
    # spl.txt:6-8 — -prefix= namespaces the expanded keys; -path= expands
    # the object at a JSON path
    df = lines(spark, '{"a": "1", "body": {"x": "7", "y": "8"}}')
    out = compile_spl(df, "* | parse-json -prefix='p_' content as a")
    assert out.first().p_a == "1"
    out = compile_spl(df, "* | parse-json -path='$.body' content")
    r = out.first()
    assert (r.x, r.y) == ("7", "8")
    assert "__spl_json_path__" not in out.columns
    out = compile_spl(df, "* | parse-json -prefix='b_' -path='$.body' content as x")
    assert out.first().b_x == "7"


def test_spl_parse_csv_flags(spark):
    # spl.txt:9-13 — -delim / -quote / -strict
    df = lines(spark, "a;b;c")
    out = compile_spl(df, "* | parse-csv -delim=';' content as x, y, z")
    assert tuple(out.first()[k] for k in ("x", "y", "z")) == ("a", "b", "c")
    # custom quote char
    df = lines(spark, "-quoted;stays- ;b;c".replace(" ;", ";"))
    out = compile_spl(df, "* | parse-csv -quote='-' -delim=';' content as x, y, z")
    assert out.first().x == "quoted;stays"
    # escape-decoded delimiter: tab via \x09 and via \t
    df = lines(spark, "a\tb\tc")
    for d in (r"\x09", r"\t"):
        out = compile_spl(df, f"* | parse-csv -delim='{d}' content as x, y, z")
        assert out.first().y == "b"
    # -strict: arity mismatch -> every output null; exact arity -> parsed
    df = lines(spark, "a,b,c")
    strict2 = compile_spl(df, "* | parse-csv -strict content as ip, time").first()
    assert (strict2.ip, strict2.time) == (None, None)
    strict4 = compile_spl(
        df, "* | parse-csv -strict content as ip, time, host, extra"
    ).first()
    assert strict4.ip is None and strict4.extra is None
    strict3 = compile_spl(df, "* | parse-csv -strict content as ip, time, host").first()
    assert (strict3.ip, strict3.time, strict3.host) == ("a", "b", "c")
    # strict counts quoted separators as content, not field breaks
    df = lines(spark, '"a,a",b,c')
    ok = compile_spl(df, "* | parse-csv -strict content as ip, time, host").first()
    assert (ok.ip, ok.time, ok.host) == ("a,a", "b", "c")


def test_spl_parse_kv_flags(spark):
    # spl.txt:15-18 — -kv-sep / -prefix / -mode='preserve'
    df = lines(spark, "k1:v1&k2:v2?k3:v3")
    out = compile_spl(df, "* | parse-kv -kv-sep=':' -delims='&?' content")
    r = out.first()
    assert (r.k1, r.k2, r.k3) == ("v1", "v2", "v3")
    out = compile_spl(df, "* | parse-kv -kv-sep=':' -prefix='prefix_' -delims='&?' content")
    assert out.first().prefix_k2 == "v2"
    # -mode='preserve' keeps a pre-existing column's value; default
    # overwrite replaces on hit, keeps old on miss
    df2 = spark.createDataFrame([("k1=new", "old", "keepme")], "content string, k1 string, k9 string")
    pres = compile_spl(df2, "* | parse-kv -mode='preserve' -delims='&' content as k1, k9").first()
    assert (pres.k1, pres.k9) == ("old", "keepme")
    over = compile_spl(df2, "* | parse-kv -delims='&' content as k1, k9").first()
    assert (over.k1, over.k9) == ("new", "keepme")


def test_spl_parse_regexp_lookbehind_with_named_groups(spark):
    """Lookbehind syntax must survive the (?P<)/(?<) spelling translation:
    '(?<=' / '(?<!' are NOT named groups (review r5 finding — the blind
    replace used to emit '(?P<=' and crash re.compile)."""
    df = lines(spark, "[warn] disk low", "[info] ok")
    out = compile_spl(df, r"* | parse-regexp content, '(?<=\[)(?<lvl>\w+)(?=\])'")
    assert [r.lvl for r in out.collect()] == ["warn", "info"]
    # Python spelling + lookahead mix still works
    out2 = compile_spl(df, r"* | parse-regexp content, '(?P<lvl>(?<=\[)\w+)'")
    assert [r.lvl for r in out2.collect()] == ["warn", "info"]
