"""Grok pattern compiler + operator — ``processor_grok``.

Reference (plugins/processor/grok/processor_grok.go): a pattern dictionary is
topo-expanded into plain regexes at Init (lines 218-258, with cycle
detection); at runtime the ``Match`` list is tried FIRST-MATCH-WINS per log
(lines 105-133); named captures ``%{NAME:alias}`` become fields, with optional
``:int``/``:float`` type annotations (lines 48-49).

Spark-first: the grok→regex compilation happens entirely at PLAN TIME in
Python (the driver), exactly mirroring the reference's Init-time expansion —
the executors only ever see compiled Java regexes inside ``rlike`` /
``regexp_extract`` expressions, fused into whole-stage codegen. First-match-
wins across the Match list is a chained ``when`` cascade.

The builtin pattern dictionary below is a minimal re-implementation of the
well-known public grok pattern names (cf. the reference's bundled pattern
files under example_config/processor_grok_patterns/) — written fresh, not
copied.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Minimal grok pattern dictionary (public pattern NAMES; fresh definitions).
BUILTIN_PATTERNS: dict[str, str] = {
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?(?:\d+\.\d+|\d+)",
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "QUOTEDSTRING": r"\"[^\"]*\"",
    "IPV4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "IP": r"%{IPV4}",
    "HOSTNAME": r"[A-Za-z0-9][A-Za-z0-9\-\.]*",
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "USERNAME": r"[A-Za-z0-9\._-]+",
    "USER": r"%{USERNAME}",
    "URIPATH": r"/[A-Za-z0-9\-\._~%!\$&'\(\)\*\+,;=:@/]*",
    "URIPARAM": r"\?[A-Za-z0-9\-\._~%!\$&'\(\)\*\+,;=:@/\?#\[\]]*",
    "URIPATHPARAM": r"%{URIPATH}(?:%{URIPARAM})?",
    "LOGLEVEL": r"(?:INFO|WARN(?:ING)?|ERROR|DEBUG|TRACE|FATAL|CRITICAL)",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    "HTTPDATE": r"\d{2}/\w{3}/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}",
}

_REF_RE = re.compile(r"%\{(\w+)(?::(\w+))?(?::(\w+))?\}")
_NAMED_GROUP_RE = re.compile(r"\(\?<([A-Za-z][A-Za-z0-9]*)>")


class GrokCycleError(ValueError):
    pass


def _decapture(body: str) -> str:
    """Turn raw capturing groups inside dictionary bodies into non-capturing
    so only aliased %{...} references produce captures."""
    return re.sub(r"(?<!\\)\((?!\?)", "(?:", body)


def expand_grok(
    pattern: str,
    dictionary: dict[str, str] | None = None,
    _stack: tuple[str, ...] = (),
) -> str:
    """Topo-expand %{NAME[:alias[:type]]} references into one flat regex
    (mirrors processor_grok.go:218-258 incl. cycle detection)."""
    patterns = {**BUILTIN_PATTERNS, **(dictionary or {})}

    def repl(m: re.Match) -> str:
        name, alias, _typ = m.group(1), m.group(2), m.group(3)
        if name in _stack:
            raise GrokCycleError(f"grok pattern cycle: {' -> '.join(_stack)} -> {name}")
        if name not in patterns:
            raise KeyError(f"unknown grok pattern %{{{name}}}")
        body = expand_grok(_decapture(patterns[name]), dictionary, _stack + (name,))
        if alias:
            # Java named groups must be alphanumeric
            safe = re.sub(r"[^A-Za-z0-9]", "", alias)
            return f"(?<{safe}>{body})"
        return f"(?:{body})"

    return _REF_RE.sub(repl, pattern)


def compile_grok(
    pattern: str, dictionary: dict[str, str] | None = None
) -> tuple[str, list[tuple[str, str]]]:
    """Compile grok → (java_regex, [(alias, spark_type)]) with group order =
    appearance order of named groups (regexp_extract uses group indexes)."""
    types: dict[str, str] = {}
    for m in _REF_RE.finditer(pattern):
        if m.group(2):
            alias = re.sub(r"[^A-Za-z0-9]", "", m.group(2))
            types[alias] = {"int": "long", "long": "long", "float": "double", "double": "double"}.get(
                m.group(3) or "", "string"
            )
    regex = expand_grok(pattern, dictionary)
    re.compile(_NAMED_GROUP_RE.sub("(", regex))  # validate eagerly (plan time)
    ordered = [(m.group(1), types.get(m.group(1), "string")) for m in _NAMED_GROUP_RE.finditer(regex)]
    return regex, ordered


def _group_index(regex: str, alias: str) -> int:
    """1-based Java group index of a named group, counting ALL capturing
    groups in order (named groups are the only captures we emit)."""
    for i, m in enumerate(_NAMED_GROUP_RE.finditer(regex), start=1):
        if m.group(1) == alias:
            return i
    raise KeyError(alias)


def parse_grok(
    df: DataFrame,
    source_key: str,
    match: Sequence[str],
    dictionary: dict[str, str] | None = None,
    ignore_parse_failure: bool = True,
    keep_source: bool = True,
) -> DataFrame:
    """Try each grok pattern in order, first-match-wins
    (processor_grok.go:105-173)."""
    compiled = [compile_grok(p, dictionary) for p in match]
    all_keys: list[tuple[str, str]] = []
    for _, caps in compiled:
        for alias, typ in caps:
            if alias not in [k for k, _ in all_keys]:
                all_keys.append((alias, typ))

    src = F.col(source_key)
    match_cols = [src.isNotNull() & src.rlike(regex) for regex, _ in compiled]

    # first-match-wins is per ROW across the whole Match list: the winning
    # pattern supplies ALL captures; later patterns never run for that row
    # even for aliases the winner lacks (processor_grok.go:105-133 breaks
    # out of the loop on the first successful match)
    win: Column = F.lit(-1)
    for i in range(len(compiled) - 1, -1, -1):
        win = F.when(match_cols[i], F.lit(i)).otherwise(win)

    out = df.withColumn("__grok_win__", win)
    for alias, typ in all_keys:
        expr: Column = F.lit(None).cast("string")
        for i in range(len(compiled) - 1, -1, -1):
            regex, caps = compiled[i]
            if alias in [a for a, _ in caps]:
                expr = F.when(
                    F.col("__grok_win__") == i,
                    F.regexp_extract(src, regex, _group_index(regex, alias)),
                ).otherwise(expr)
        if typ != "string":
            expr = expr.cast(typ)
        out = out.withColumn(alias, expr)
    out = out.drop("__grok_win__")

    any_match = match_cols[0]
    for c in match_cols[1:]:
        any_match = any_match | c
    if not ignore_parse_failure:
        out = out.filter(any_match)
    if not keep_source:
        out = out.withColumn(source_key, F.when(~any_match, src))
    return out
