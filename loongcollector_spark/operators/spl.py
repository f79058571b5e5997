"""SPL (SLS Processing Language) subset compiler — ``processor_spl``.

The reference embeds a prebuilt SPL engine (core/plugin/processor/
ProcessorSPL.h; exercised by core/unittest/spl/SplUnittest.cpp). The engine
itself is a closed library, but the language surface its unit tests exercise
is compact and maps 1:1 onto DataFrame operations — so this module compiles
that subset at PLAN TIME into a composed DataFrame, keeping every stage a
Catalyst expression:

    * | where <sql-expr>
      | extend k=<expr>[, k2=<expr>]          (Presto-flavored fns translated)
      | project c1, c2 / project-away c / project-rename new=old
      | parse-json <col>                      (dynamic keys -> columns)
      | parse-regexp <col>, '<pat>' as a, b
      | parse-csv <col> as a, b, c
      | parse-kv -regexp <col>, '<pat>' / parse-kv -delims='<chars>' <col>
      | limit N

Dynamic-key stages (parse-json / parse-kv) need the key set at plan time:
a lightweight discovery job collects the distinct keys first (one scan of
the source column only — column-pruned), then each key becomes a projected
column; rows lacking a key get null, matching the reference's per-row
contents. At 100 TB run discovery on a sample or pass ``keys=`` explicitly
via parse_json/parse_key_value operators instead.

Expression translation covers the Presto names the reference tests use:
json_extract -> get_json_object (scalars extract as JSON text; note Presto
quotes string scalars, Spark does not), date_parse(x, '%...') -> to_timestamp
with the MySQL format converted, to_unixtime -> unix_timestamp. Everything
else passes through F.expr — Spark SQL's function surface covers the rest.

Out of scope (documented): multi-statement scripts (``;`` result branches),
.let bindings, stats/sort stages — use the DataFrame API directly for those.
"""

from __future__ import annotations

import re
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class SplError(ValueError):
    pass


def _split_top(s: str, sep: str) -> list[str]:
    """Split on a separator at depth 0: quotes ('...' / "...") and
    parentheses protected. When splitting stages on '|', the SQL
    string-concat operator '||' is NOT a separator."""
    parts, buf, q, depth = [], [], None, 0
    i = 0
    while i < len(s):
        ch = s[i]
        if q:
            buf.append(ch)
            if ch == q:
                q = None
        elif ch in "'\"":
            q = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == sep == "|" and i + 1 < len(s) and s[i + 1] == "|" and depth == 0:
            buf.append("||")
            i += 1
        elif ch == sep and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
        i += 1
    parts.append("".join(buf))
    return parts


def _rsplit_as(s: str) -> tuple[str, str] | None:
    """Split at the LAST top-level ' as ' (quote/paren aware) — the word
    'as' inside a quoted regex must not terminate the pattern."""
    q, depth = None, 0
    best = None
    for i, ch in enumerate(s):
        if q:
            if ch == q:
                q = None
        elif ch in "'\"":
            q = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and q is None and re.match(r"\s[aA][sS]\s", s[i : i + 4]):
            best = i
    if best is None:
        return None
    return s[:best], s[best + 4 :]


_MYSQL_TO_JAVA = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd", "%H": "HH",
    "%h": "hh", "%i": "mm", "%s": "ss", "%S": "ss", "%f": "SSSSSS",
    "%T": "HH:mm:ss", "%p": "a",
}


def _mysql_format_to_java(fmt: str) -> str:
    """MySQL %-format -> Java DateTimeFormatter pattern; literal LETTERS in
    the input (e.g. the T in ISO timestamps) must be quoted in Java."""
    out: list[str] = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            tok = fmt[i : i + 2]
            out.append(_MYSQL_TO_JAVA.get(tok, tok[1]))
            i += 2
        elif fmt[i].isalpha():
            out.append(f"'{fmt[i]}'")
            i += 1
        else:
            out.append(fmt[i])
            i += 1
    return "".join(out)


def _translate_expr(expr: str) -> str:
    """Presto-flavored SPL expression -> Spark SQL expression."""
    out = expr
    out = re.sub(r"\bjson_extract_scalar\s*\(", "get_json_object(", out)
    out = re.sub(r"\bjson_extract\s*\(", "get_json_object(", out)
    out = re.sub(r"\bto_unixtime\s*\(", "unix_timestamp(", out)

    def fix_date_parse(m: re.Match) -> str:
        args = _split_top(m.group(1), ",")
        if len(args) == 2:
            fmt = args[1].strip()
            if fmt.startswith("'") and fmt.endswith("'"):
                java = _mysql_format_to_java(fmt[1:-1])
                # the pattern is itself a SQL string literal: double any
                # internal quotes (Java-literal 'T' -> ''T'')
                fmt = "'" + java.replace("'", "''") + "'"
            return f"to_timestamp({args[0].strip()}, {fmt})"
        return f"to_timestamp({m.group(1)})"

    out = re.sub(r"\bdate_parse\s*\(([^()]*)\)", fix_date_parse, out)
    return out


def _unquote_ident(s: str) -> str:
    s = s.strip()
    if len(s) >= 2 and s[0] == '"' and s[-1] == '"':
        return s[1:-1]
    return s


def _unquote_str(s: str) -> str:
    s = s.strip()
    if len(s) >= 2 and s[0] == "'" and s[-1] == "'":
        return s[1:-1]
    return s


def _discover_json_keys(df: DataFrame, col: str) -> list[str]:
    rows = (
        df.select(F.explode(F.json_object_keys(F.col(col))).alias("k"))
        .distinct()
        .collect()
    )
    return sorted(r.k for r in rows)


def _stage_parse_json(df: DataFrame, rest: str) -> DataFrame:
    col = _unquote_ident(rest)
    for k in _discover_json_keys(df, col):
        df = df.withColumn(k, F.get_json_object(F.col(col), f"$.{k}"))
    return df


def _stage_parse_regexp(df: DataFrame, rest: str) -> DataFrame:
    m = _rsplit_as(rest)
    if not m:
        raise SplError(f"parse-regexp needs 'as a, b': {rest!r}")
    left, names = m
    args = _split_top(left, ",")
    col = _unquote_ident(args[0])
    pat = _unquote_str(args[1])
    for i, name in enumerate(n.strip() for n in _split_top(names, ",")):
        df = df.withColumn(_unquote_ident(name), F.regexp_extract(F.col(col), pat, i + 1))
    return df


def _stage_parse_csv(df: DataFrame, rest: str) -> DataFrame:
    from loongcollector_spark.operators.parse_delimiter import parse_csv

    m = _rsplit_as(rest)
    if not m:
        raise SplError(f"parse-csv needs 'as a, b': {rest!r}")
    col = _unquote_ident(m[0].rstrip(", \t"))
    keys = [_unquote_ident(n) for n in _split_top(m[1], ",")]
    return parse_csv(df, col, keys, keep_source=True)


def _stage_parse_kv(df: DataFrame, rest: str) -> DataFrame:
    m = re.match(r"^-regexp\s+(.*)$", rest)
    if m:
        args = _split_top(m.group(1), ",")
        col = _unquote_ident(args[0])
        pat = _unquote_str(args[1])
        kv = F.map_from_arrays(
            F.regexp_extract_all(F.col(col), F.lit(pat), 1),
            F.regexp_extract_all(F.col(col), F.lit(pat), 2),
        )
    else:
        m = re.match(r"^-delims\s*=\s*(\S+)\s+(.*)$", rest)
        if not m:
            raise SplError(f"parse-kv needs -regexp or -delims: {rest!r}")
        delims = re.escape(_unquote_str(m.group(1)))
        col = _unquote_ident(m.group(2))
        kv = F.str_to_map(F.col(col), F.lit(f"[{delims}]"), F.lit("="))
    tmp = "__spl_kv__"
    df = df.withColumn(tmp, kv)
    keys = sorted(
        r.k for r in df.select(F.explode(F.map_keys(F.col(tmp))).alias("k")).distinct().collect()
    )
    for k in keys:
        df = df.withColumn(k, F.col(tmp).getItem(k))
    return df.drop(tmp)


def _stage_project_rename(df: DataFrame, rest: str) -> DataFrame:
    for part in _split_top(rest, ","):
        new, _, old = part.partition("=")
        df = df.withColumnRenamed(_unquote_ident(old), _unquote_ident(new))
    return df


def compile_spl(df: DataFrame, script: str) -> DataFrame:
    """Compile one linear SPL pipeline into a DataFrame (see module doc for
    the supported subset)."""
    script = script.strip()
    statements = [s for s in _split_top(script, ";") if s.strip()]
    if len(statements) > 1:
        raise SplError("multi-statement SPL scripts are not supported; "
                       "compose compile_spl calls or use the DataFrame API")
    script = statements[0].strip() if statements else ""
    stages = [s.strip() for s in _split_top(script, "|")]
    if stages and stages[0] in ("*", ""):
        stages = stages[1:]
    out = df
    for stage in stages:
        if not stage:
            continue
        verb, _, rest = stage.partition(" ")
        rest = rest.strip()
        if verb == "where":
            out = out.filter(F.expr(_translate_expr(rest)))
        elif verb == "extend":
            for part in _split_top(rest, ","):
                name, _, expr = part.partition("=")
                out = out.withColumn(
                    _unquote_ident(name), F.expr(_translate_expr(expr.strip()))
                )
        elif verb == "project":
            out = out.select(*[_unquote_ident(c) for c in _split_top(rest, ",")])
        elif verb == "project-away":
            out = out.drop(*[_unquote_ident(c) for c in _split_top(rest, ",")])
        elif verb == "project-rename":
            out = _stage_project_rename(out, rest)
        elif verb == "parse-json":
            out = _stage_parse_json(out, rest)
        elif verb == "parse-regexp":
            out = _stage_parse_regexp(out, rest)
        elif verb == "parse-csv":
            out = _stage_parse_csv(out, rest)
        elif verb == "parse-kv":
            out = _stage_parse_kv(out, rest)
        elif verb == "limit":
            out = out.limit(int(rest))
        else:
            raise SplError(f"unsupported SPL stage {verb!r}")
    return out


def spl_processor(df: DataFrame, script: str) -> DataFrame:
    """PROCESSORS-registry entry point (processor_spl Script config key)."""
    return compile_spl(df, script)
