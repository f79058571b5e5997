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
      | parse-json <col> [as k1, k2]          (dynamic keys -> columns)
      | parse-regexp <col>, '<pat>' as a, b
      | parse-csv <col> as a, b, c
      | parse-kv -regexp <col>, '<pat>' / parse-kv -delims='<chars>' <col>
        (either form accepts a trailing ``as k1, k2`` key list)
      | stats <agg> as <name>[, ...] by k1, k2   (count()/sum/avg/min/max …)
      | sort by c1 [desc][, c2 ...]              (total order: range shuffle)
      | limit N

Dynamic-key stages (parse-json / parse-kv) need the key set at plan time.
Three resolution modes, cheapest first:

    1. explicit ``as k1, k2`` on the stage — ZERO extra jobs (the 100 TB
       path; the key set is part of the plan, like the reference's
       per-config field lists);
    2. ``compile_spl(..., sample_rows=N)`` — discovery scans only the
       first N rows of the source column (one LIMIT-bounded, column-pruned
       job per dynamic stage); keys absent from the sample are missed, so
       use it when the key universe is stable across rows;
    3. default full discovery — one distinct-scan of the source column per
       dynamic stage (column-pruned but full-table; fine at test scale,
       explicit keys are the scale path).

Rows lacking a key get null, matching the reference's per-row contents.

Multi-statement scripts (the ProcessorSPL contract, exercised by
SplUnittest.cpp TestMultiParse) compile via :func:`compile_spl_multi`:

    .let src = * | parse-json content;
    .let ds1 = $src | where type = 'kv' | parse-kv -delims='&?' message;
    $ds1;
    .let ds2 = $src | where type = 'csv' | parse-csv message as x, y, z;
    $ds2;

``.let name = <pipeline>`` binds a dataset (head ``*`` = the input, or
``$other`` = a prior binding); a ``$name`` statement (optionally with more
``| stage``s) EMITS that dataset as a result branch. Branches come back as
an ordered ``[(name, DataFrame), ...]`` — the Spark analogue of the
reference returning one PipelineEventGroup per SPL result, which the caller
routes to per-branch sinks (see ``spl_fanout``). Bindings are lazy logical
plans: Catalyst dedups the shared prefix per-branch, and callers writing
all branches should persist the input once (pipeline.py does).

Expression translation covers the Presto names the reference tests use:
json_extract -> get_json_object (scalars extract as JSON text; note Presto
quotes string scalars, Spark does not), date_parse(x, '%...') -> to_timestamp
with the MySQL format converted, to_unixtime -> unix_timestamp. Everything
else passes through F.expr — Spark SQL's function surface covers the rest.

``stats`` compiles to groupBy().agg() — partial aggregation map-side, only
(group, partial) rows shuffle. ``sort by`` is a TOTAL order (Spark range
partitions + shuffles); prefer ``stats ... | sort`` on the already-reduced
result, as the reference engine's own stats-then-sort idiom does.

Error / quota contract (ProcessorSPL::Init, ProcessorSPL.cpp:35-101 +
ProcessorSPL.h:33-34 defaults; mapping enforced by
:func:`validate_spl_config`):

    ======================  =====================  ==========================
    reference knob           reference behavior     here
    ======================  =====================  ==========================
    Script (mandatory)       missing -> Init fails  SplError at init
    logtail_spl_query_max_   script > 65536 B ->    SplError at init AND at
    size flag (65536)        Init fails             every compile_spl* call
    invalid script           Init fails ("failed    SplError at compile (plan
                             to parse spl")         build — Spark plans lazily,
                                                    so init validates shape/
                                                    size, the stage grammar
                                                    errors on first compile)
    TimeoutMilliSeconds      non-uint -> warn +     normalized to default
    (default 1000)           default; runtime       1000; per-OPERATOR wall
                             abort + timeout        clocks don't exist in
                             counter                Spark's execution model —
                                                    the cluster-side analogue
                                                    is job-group cancellation
                                                    (sc.cancelJobGroup) /
                                                    spark.task.reaper.*, and
                                                    structured streaming
                                                    trigger intervals bound
                                                    per-batch latency
    MaxMemoryBytes           non-uint -> warn +     normalized to default
    (default 50 MiB)         default; runtime       50 MiB; per-operator
                             abort + mem counter    memory caps are replaced
                                                    by executor memory +
                                                    spill-to-disk (Tungsten),
                                                    so exceeding it degrades
                                                    to spill, never an abort
    logtail_spl_pipeline_    16 concurrent SPL      N/A — Spark's scheduler
    quota flag               pipelines per agent    pools own concurrency
    error counters           proc_spl_*_count       SplError raised to the
                             metrics                caller; pipeline-level
                                                    fail counts via observe()
                                                    metrics (metrics.py)
    ======================  =====================  ==========================
"""

from __future__ import annotations

import re
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class SplError(ValueError):
    pass


# ProcessorSPL.cpp:26-27 flag defaults + ProcessorSPL.h:33-34 member inits
SPL_QUERY_MAX_SIZE = 65536
SPL_DEFAULT_TIMEOUT_MILLS = 1000
SPL_DEFAULT_MAX_MEMORY_BYTES = 50 * 1024 * 1024


def _uint_or_default(value, default: int) -> int:
    """GetOptionalUIntParam semantics (ParamExtractor): absent -> default;
    present but not a non-negative integer -> WARN + default (the reference
    logs PARAM_WARNING_DEFAULT and keeps going, never aborts)."""
    if value is None:
        return default
    if isinstance(value, bool):
        return default
    if isinstance(value, int) and value >= 0:
        return value
    if isinstance(value, str) and value.isdigit():
        return int(value)
    return default


def validate_spl_config(config: dict) -> dict:
    """Replicate ProcessorSPL::Init's config validation (see the module-doc
    mapping table): Script is mandatory and capped at SPL_QUERY_MAX_SIZE
    bytes (both Init failures -> SplError, i.e. the config is rejected);
    TimeoutMilliSeconds / MaxMemoryBytes normalize to their defaults when
    invalid (the reference warns and keeps the default). Returns the
    normalized {script, timeout_mills, max_memory_bytes}."""
    script = config.get("Script")
    if not isinstance(script, str) or not script.strip():
        raise SplError("processor_spl: mandatory string param Script is missing")
    if len(script.encode()) > SPL_QUERY_MAX_SIZE:
        raise SplError(
            f"processor_spl: Script exceeds logtail_spl_query_max_size "
            f"({len(script.encode())} > {SPL_QUERY_MAX_SIZE} bytes)"
        )
    return {
        "script": script,
        "timeout_mills": _uint_or_default(
            config.get("TimeoutMilliSeconds"), SPL_DEFAULT_TIMEOUT_MILLS
        ),
        "max_memory_bytes": _uint_or_default(
            config.get("MaxMemoryBytes"), SPL_DEFAULT_MAX_MEMORY_BYTES
        ),
    }


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


def _discover_json_keys(
    df: DataFrame, col: str, sample_rows: int | None = None
) -> list[str]:
    src = df.select(col)
    if sample_rows:
        src = src.limit(sample_rows)
    rows = (
        src.select(F.explode(F.json_object_keys(F.col(col))).alias("k"))
        .distinct()
        .collect()
    )
    return sorted(r.k for r in rows)


def _keys_or_rest(rest: str) -> tuple[str, list[str] | None]:
    """Split a trailing explicit ``as k1, k2`` key list off a stage tail."""
    m = _rsplit_as(rest)
    if not m:
        return rest, None
    return m[0].rstrip(", \t"), [_unquote_ident(k) for k in _split_top(m[1], ",")]


_FLAG_RE = re.compile(
    r"^-([a-z][a-z-]*)(?:\s*=\s*('(?:[^'\\]|\\.)*'|\"(?:[^\"\\]|\\.)*\"|\S+))?\s+"
)


def _parse_flags(rest: str) -> tuple[dict[str, object], str]:
    """Peel leading ``-name[='value']`` flags off a stage tail (the SPL
    option syntax the benchmark corpus core/unittest/spl/spl.txt exercises:
    -prefix/-path/-delim/-quote/-strict/-kv-sep/-mode/-regexp/-delims)."""
    flags: dict[str, object] = {}
    while True:
        m = _FLAG_RE.match(rest)
        if not m:
            return flags, rest
        val = m.group(2)
        if val is None:
            flags[m.group(1)] = True
        else:
            flags[m.group(1)] = _unquote_str(val) if val[0] in "'\"" else val
        rest = rest[m.end() :]


def _decode_esc(s: str) -> str:
    """Decode flag-value escapes ('\\t', '\\x09', octal '\\11'); a value the
    codec rejects (e.g. a lone backslash delimiter) passes through raw."""
    if "\\" not in s:
        return s
    try:
        import codecs

        return codecs.decode(s, "unicode_escape")
    except Exception:
        return s


def _stage_parse_json(
    df: DataFrame, rest: str, sample_rows: int | None = None
) -> DataFrame:
    rest, keys = _keys_or_rest(rest)
    flags, rest = _parse_flags(rest)
    prefix = str(flags.get("prefix", ""))
    col = _unquote_ident(rest)
    tmp = None
    if "path" in flags:
        # ``-path='$.body'``: expand the object AT that JSON path
        tmp = "__spl_json_path__"
        df = df.withColumn(tmp, F.get_json_object(F.col(col), str(flags["path"])))
        col = tmp
    if keys is None:
        keys = _discover_json_keys(df, col, sample_rows)
    for k in keys:
        df = df.withColumn(prefix + k, F.get_json_object(F.col(col), f"$.{k}"))
    return df.drop(tmp) if tmp else df


def _stage_parse_regexp(df: DataFrame, rest: str) -> DataFrame:
    m = _rsplit_as(rest)
    if not m:
        # ``parse-regexp col, '(?P<ip>\S+)...'`` — named groups carry the
        # output keys (spl.txt line 4); translate Python's (?P<) spelling to
        # the JVM's (?<) and extract by group index
        args = _split_top(rest, ",")
        if len(args) != 2:
            raise SplError(f"parse-regexp needs 'as a, b' or (?P<name>) groups: {rest!r}")
        col = _unquote_ident(args[0])
        pat = _unquote_str(args[1])
        # normalize named-group spelling without touching lookbehinds:
        # only ``(?<`` / ``(?P<`` followed by an identifier char is a named
        # group — ``(?<=`` and ``(?<!`` must pass through untouched
        py_pat = re.sub(r"\(\?P?<(?=[A-Za-z_])", "(?P<", pat)
        groups = re.compile(py_pat).groupindex
        if not groups:
            raise SplError(f"parse-regexp needs 'as a, b' or (?P<name>) groups: {rest!r}")
        jvm_pat = re.sub(r"\(\?P<(?=[A-Za-z_])", "(?<", pat)
        for name, idx in groups.items():
            df = df.withColumn(name, F.regexp_extract(F.col(col), jvm_pat, idx))
        return df
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
    flags, left = _parse_flags(m[0])
    col = _unquote_ident(left.rstrip(", \t"))
    keys = [_unquote_ident(n) for n in _split_top(m[1], ",")]
    if not flags:
        return parse_csv(df, col, keys, keep_source=True)
    # flag variants (spl.txt): -delim custom separator (escape decoded),
    # -quote custom quote char, -strict = the split arity must equal the key
    # count or every output stays null (public SLS SPL parse-csv contract)
    sep = _decode_esc(str(flags.get("delim", ",")))[:1] or ","
    quote = _decode_esc(str(flags.get("quote", '"')))[:1] or '"'
    schema = ", ".join(f"`{k}` string" for k in keys)
    parsed = F.from_csv(
        F.col(col), F.lit(schema), {"sep": sep, "quote": quote, "escape": quote}
    )
    ok = None
    if "strict" in flags:
        # quote-aware field count: drop quoted runs, then count separators
        q = re.escape(quote)
        stripped = F.regexp_replace(F.col(col), f"{q}(?:[^{q}]|{q}{q})*{q}", "")
        ok = F.size(F.split(stripped, re.escape(sep), -1)) == F.lit(len(keys))
    for k in keys:
        val = parsed.getField(k)
        df = df.withColumn(k, F.when(ok, val) if ok is not None else val)
    return df


def _stage_parse_kv(
    df: DataFrame, rest: str, sample_rows: int | None = None
) -> DataFrame:
    rest, keys = _keys_or_rest(rest)
    flags, rest = _parse_flags(rest)
    prefix = str(flags.get("prefix", ""))
    mode = str(flags.get("mode", "overwrite"))
    if flags.get("regexp"):
        args = _split_top(rest, ",")
        col = _unquote_ident(args[0])
        pat = _unquote_str(args[1])
        kv = F.map_from_arrays(
            F.regexp_extract_all(F.col(col), F.lit(pat), 1),
            F.regexp_extract_all(F.col(col), F.lit(pat), 2),
        )
    elif "delims" in flags:
        delims = re.escape(_decode_esc(str(flags["delims"])))
        kv_sep = re.escape(_decode_esc(str(flags.get("kv-sep", "="))))
        col = _unquote_ident(rest)
        kv = F.str_to_map(F.col(col), F.lit(f"[{delims}]"), F.lit(kv_sep))
    else:
        raise SplError(f"parse-kv needs -regexp or -delims: {rest!r}")
    tmp = "__spl_kv__"
    df = df.withColumn(tmp, kv)
    if keys is None:
        src = df.select(tmp)
        if sample_rows:
            src = src.limit(sample_rows)
        keys = sorted(
            r.k
            for r in src.select(
                F.explode(F.map_keys(F.col(tmp))).alias("k")
            ).distinct().collect()
        )
    for k in keys:
        out_name = prefix + k
        new = F.col(tmp).getItem(k)
        if out_name in df.columns and out_name != tmp:
            # -mode='preserve' keeps a pre-existing field's value; the
            # default overwrites on a hit but keeps the old value on a miss
            new = (
                F.coalesce(F.col(out_name), new)
                if mode == "preserve"
                else F.coalesce(new, F.col(out_name))
            )
        df = df.withColumn(out_name, new)
    return df.drop(tmp)


def _rsplit_keyword(s: str, word: str) -> tuple[str, str] | None:
    """Split at the LAST top-level ' <word> ' (quote/paren aware)."""
    q, depth = None, 0
    best = None
    probe = re.compile(r"\s" + word + r"\s", re.IGNORECASE)
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
        elif depth == 0 and q is None and probe.match(s[i : i + len(word) + 2]):
            best = i
    if best is None:
        return None
    return s[:best], s[best + len(word) + 2 :]


def _stage_stats(df: DataFrame, rest: str) -> DataFrame:
    """``stats <agg> as <name>[, ...] by k1, k2`` → groupBy().agg(): partial
    aggregation runs map-side, only (group, partial) rows cross the shuffle.
    Presto-style ``count()`` is translated to ``count(*)``."""
    m = _rsplit_keyword(rest, "by")
    if m:
        aggs_text, by_text = m
        by_cols = [_unquote_ident(c) for c in _split_top(by_text, ",")]
    else:
        aggs_text, by_cols = rest, []
    aggs = []
    for part in _split_top(aggs_text, ","):
        named = _rsplit_as(part)
        if not named:
            raise SplError(f"stats aggregate needs 'as <name>': {part!r}")
        expr, name = named
        expr = re.sub(r"\bcount\s*\(\s*\)", "count(*)", _translate_expr(expr.strip()))
        aggs.append(F.expr(expr).alias(_unquote_ident(name)))
    if not aggs:
        raise SplError("stats needs at least one aggregate")
    return df.groupBy(*by_cols).agg(*aggs) if by_cols else df.agg(*aggs)


def _stage_sort(df: DataFrame, rest: str) -> DataFrame:
    """``sort by c1 [desc][, c2 ...]`` — a TOTAL order (range shuffle)."""
    stripped = re.sub(r"^by\s+", "", rest.strip(), flags=re.IGNORECASE)
    if stripped == rest.strip():
        raise SplError(f"sort needs 'by': sort by c1 [desc], got {rest!r}")
    rest = stripped
    cols = []
    for part in _split_top(rest, ","):
        toks = part.strip().split()
        if not toks:
            continue
        name = _unquote_ident(toks[0])
        desc = len(toks) > 1 and toks[1].lower() == "desc"
        cols.append(F.col(name).desc() if desc else F.col(name).asc())
    if not cols:
        raise SplError("sort needs at least one column")
    return df.orderBy(*cols)


def _stage_project_rename(df: DataFrame, rest: str) -> DataFrame:
    for part in _split_top(rest, ","):
        new, _, old = part.partition("=")
        df = df.withColumnRenamed(_unquote_ident(old), _unquote_ident(new))
    return df


def _apply_stages(
    out: DataFrame, stages: list[str], sample_rows: int | None
) -> DataFrame:
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
            out = _stage_parse_json(out, rest, sample_rows)
        elif verb == "parse-regexp":
            out = _stage_parse_regexp(out, rest)
        elif verb == "parse-csv":
            out = _stage_parse_csv(out, rest)
        elif verb == "parse-kv":
            out = _stage_parse_kv(out, rest, sample_rows)
        elif verb == "stats":
            out = _stage_stats(out, rest)
        elif verb == "sort":
            out = _stage_sort(out, rest)
        elif verb == "limit":
            out = out.limit(int(rest))
        else:
            raise SplError(f"unsupported SPL stage {verb!r}")
    return out


def _compile_pipeline(
    df: DataFrame,
    text: str,
    bindings: dict[str, DataFrame],
    sample_rows: int | None,
) -> tuple[DataFrame, str | None]:
    """Compile one ``head | stage | ...`` pipeline. The head names the
    source: ``*`` (or empty) = the processor input, ``$name`` = a prior
    ``.let`` binding. Returns (result, referenced-binding-name-or-None)."""
    stages = [s.strip() for s in _split_top(text.strip(), "|")]
    ref = None
    if stages and stages[0].startswith("$"):
        ref = stages[0][1:].strip()
        if ref not in bindings:
            raise SplError(f"undefined SPL dataset ${ref}")
        base = bindings[ref]
        stages = stages[1:]
    else:
        if stages and stages[0] in ("*", ""):
            stages = stages[1:]
        base = df
    return _apply_stages(base, stages, sample_rows), ref


def compile_spl(
    df: DataFrame, script: str, *, sample_rows: int | None = None
) -> DataFrame:
    """Compile one linear SPL pipeline into a DataFrame (see module doc for
    the supported subset). ``sample_rows`` bounds dynamic-key discovery for
    parse-json / parse-kv stages without an explicit ``as`` key list."""
    if len(script.encode()) > SPL_QUERY_MAX_SIZE:
        raise SplError(
            f"spl query too large ({len(script.encode())} > {SPL_QUERY_MAX_SIZE} bytes)"
        )
    script = script.strip()
    statements = [s for s in _split_top(script, ";") if s.strip()]
    if len(statements) > 1:
        raise SplError(
            "multi-statement SPL script: use compile_spl_multi for "
            ".let bindings and $name result branches"
        )
    script = statements[0].strip() if statements else ""
    out, _ = _compile_pipeline(df, script, {}, sample_rows)
    return out


def compile_spl_multi(
    df: DataFrame, script: str, *, sample_rows: int | None = None
) -> list[tuple[str, DataFrame]]:
    """Compile a multi-statement SPL script into ordered result branches.

    Grammar (ProcessorSPL contract, core/plugin/processor/ProcessorSPL.cpp:
    30-101; exercised by core/unittest/spl/SplUnittest.cpp TestMultiParse):
    ``;``-separated statements, where ``.let name = <pipeline>`` binds a
    dataset and any other statement EMITS a result branch. Each branch maps
    to one output PipelineEventGroup in the reference; here each is a
    DataFrame the caller routes to its sink. Branch names: the ``$ref``
    head if present (suffixed on re-emission), else ``result<i>``.

    Bindings stay lazy logical plans — emitting N branches re-evaluates the
    shared prefix N times unless the caller persists the input (the routed
    write path in pipeline.py materializes once before fan-out)."""
    if len(script.encode()) > SPL_QUERY_MAX_SIZE:
        raise SplError(
            f"spl query too large ({len(script.encode())} > {SPL_QUERY_MAX_SIZE} bytes)"
        )
    bindings: dict[str, DataFrame] = {}
    results: list[tuple[str, DataFrame]] = []
    for stmt in (s.strip() for s in _split_top(script.strip(), ";")):
        if not stmt:
            continue
        m = re.match(r"^\.let\s+([A-Za-z_]\w*)\s*=\s*(.*)$", stmt, re.DOTALL)
        if m:
            bound, _ = _compile_pipeline(df, m.group(2), bindings, sample_rows)
            bindings[m.group(1)] = bound
            continue
        out, ref = _compile_pipeline(df, stmt, bindings, sample_rows)
        name = ref or f"result{len(results)}"
        if any(n == name for n, _ in results):
            name = f"{name}_{len(results)}"
        results.append((name, out))
    if not results:
        raise SplError("multi-statement SPL script emitted no result branch")
    return results


def spl_fanout(
    df: DataFrame, script: str, *, sample_rows: int | None = None
) -> dict[str, DataFrame]:
    """Named result branches of a multi-statement script, for routing each
    to a sink (the reference hands each result group to the flusher chain)."""
    return dict(compile_spl_multi(df, script, sample_rows=sample_rows))


def spl_processor(
    df: DataFrame, script: str, sample_rows: int | None = None
) -> DataFrame:
    """PROCESSORS-registry entry point (processor_spl Script config key;
    ``sample_rows`` bounds dynamic-key discovery, see compile_spl)."""
    return compile_spl(df, script, sample_rows=sample_rows)
