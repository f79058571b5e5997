"""DuckDB-SQL replica of the deterministic F1 generator (synthetic.py).

The tokenized-sequence table is a pure function of the row index, so the
driver's DuckDB oracle can regenerate it IN SQL and verify the flagship
tokenized queries end-to-end — per-row source/n_tok/header-token equality is
bit-exact (validated against numpy over 100k rows: splitmix64 via HUGEINT
arithmetic with 32-bit multiply splitting, u01 double division, pow(u,3)
floor, and cumulative-weight searchsorted all agree).

This is the strongest form of the north rule's "token-array equality vs the
reference output": the oracle recomputes the expected tokens from seed alone.
"""

from __future__ import annotations

import numpy as np

from loongcollector_spark.sources.synthetic import (
    MAX_TOK,
    MIN_TOK,
    SOURCE_WEIGHTS,
    SOURCES,
    VOCAB_SIZE,
    _LEVELS,
    _METHODS,
    _STATUS,
)

_M64 = 18446744073709551616  # 2^64


def _mul64(a: str, b: str) -> str:
    """(a*b) mod 2^64 over HUGEINT without overflowing signed 128-bit."""
    return (
        f"(( ({a}) % 4294967296) * ({b} % 4294967296) "
        f"+ ((( ({a}) % 4294967296) * ({b} // 4294967296) "
        f"+ (({a}) // 4294967296) * ({b} % 4294967296)) % 4294967296) * 4294967296) % {_M64}"
    )


def _xorshift(x: str, s: int) -> str:
    return f"CAST(xor(CAST(({x}) AS UBIGINT), CAST(({x}) AS UBIGINT) >> {s}) AS HUGEINT)"


def splitmix64_sql(x: str) -> str:
    """Full splitmix64 finalizer of a u64-as-HUGEINT SQL expression."""
    x1 = f"((({x}) + 11400714819323198485) % {_M64})"
    x2 = _xorshift(x1, 30)
    x3 = _mul64(x2, "13787848793156543929")
    x4 = _xorshift(x3, 27)
    x5 = _mul64(x4, "10723151780598845931")
    return _xorshift(x5, 31)


def _xor_const(a: str, c: int) -> str:
    return f"CAST(xor(CAST(({a}) AS UBIGINT), CAST({c} AS UBIGINT)) AS HUGEINT)"


def _sql_str_array(vals) -> str:
    return "[" + ", ".join(f"'{v}'" for v in vals) + "]"


def f1_cte(n_rows: int, seed: int = 42, token_positions: tuple[int, ...] = (0, 2, 5)) -> str:
    """WITH-clause SQL producing `f1(i, source, n_tok, t{p}...)` identical to
    generate_sequences(spark, n_rows, seed) header fields. token_positions are
    0-based header indices (token j lives at stream offset j+1)."""
    cum = np.cumsum(SOURCE_WEIGHTS)
    cum_sql = "[" + ", ".join(repr(float(c)) for c in cum) + "]"
    src_salt = 0xA5A5A5A5 + seed
    ntok_salt = 0x5EED5EED + seed
    keymul = seed * 0x10001
    tok_cols = ",\n  ".join(
        f"CAST({splitmix64_sql(f'(row_key + {p + 1}) % {_M64}')} % {VOCAB_SIZE} AS INT) AS t{p}"
        for p in token_positions
    )
    return f"""
ids AS (SELECT CAST(range AS HUGEINT) AS i FROM range({n_rows})),
g AS (SELECT i,
  {splitmix64_sql(_xor_const('i', src_salt))} AS src_h,
  {splitmix64_sql(_xor_const('i', ntok_salt))} AS ntok_h,
  {splitmix64_sql(f'(i + {keymul}) % {_M64}')} AS row_key
FROM ids),
g2 AS (SELECT i, row_key,
  len(list_filter({cum_sql}, c -> c <= CAST(src_h AS DOUBLE) / 18446744073709551616.0)) AS src_idx_raw,
  CAST({MIN_TOK} + floor(({MAX_TOK} - {MIN_TOK}) * power(CAST(ntok_h AS DOUBLE) / 18446744073709551616.0, 3)) AS INT) AS n_tok
FROM g),
f1 AS (SELECT i,
  {_sql_str_array(SOURCES)}[least(src_idx_raw, {len(SOURCES) - 1}) + 1] AS source,
  n_tok,
  {tok_cols}
FROM g2)"""


def f1_tokens_cte(n_rows: int, seed: int = 42) -> str:
    """WITH-clause SQL producing ``f1t(i, doc_id, source, n_tok, tokens)``
    with the FULL token list per row — token j (0-based) is
    splitmix64(row_key + j + 1) % VOCAB_SIZE, replayed inside a DuckDB list
    lambda. The strongest oracle form: the verifier regenerates every token
    of every sequence from seed alone and then re-runs the operator's
    semantics over them in SQL."""
    cum = np.cumsum(SOURCE_WEIGHTS)
    cum_sql = "[" + ", ".join(repr(float(c)) for c in cum) + "]"
    src_salt = 0xA5A5A5A5 + seed
    ntok_salt = 0x5EED5EED + seed
    keymul = seed * 0x10001
    tok_j = splitmix64_sql(f"(row_key + j + 1) % {_M64}")
    return f"""
ids AS (SELECT CAST(range AS HUGEINT) AS i FROM range({n_rows})),
g AS (SELECT i,
  {splitmix64_sql(_xor_const('i', src_salt))} AS src_h,
  {splitmix64_sql(_xor_const('i', ntok_salt))} AS ntok_h,
  {splitmix64_sql(f'(i + {keymul}) % {_M64}')} AS row_key
FROM ids),
g2 AS (SELECT i, row_key,
  len(list_filter({cum_sql}, c -> c <= CAST(src_h AS DOUBLE) / 18446744073709551616.0)) AS src_idx_raw,
  CAST({MIN_TOK} + floor(({MAX_TOK} - {MIN_TOK}) * power(CAST(ntok_h AS DOUBLE) / 18446744073709551616.0, 3)) AS INT) AS n_tok
FROM g),
g3 AS (SELECT i, row_key, n_tok,
  {_sql_str_array(SOURCES)}[least(src_idx_raw, {len(SOURCES) - 1}) + 1] AS source
FROM g2),
f1t AS MATERIALIZED (SELECT i,
  source || '-' || lpad(CAST(i AS VARCHAR), 12, '0') AS doc_id,
  source, n_tok,
  list_transform(range(0, n_tok), j -> CAST({tok_j} % {VOCAB_SIZE} AS INT)) AS tokens
FROM g3)"""


def contamination_oracle(
    n_rows: int, patterns: list[list[int]], seed: int = 42
) -> str:
    """Oracle for queries.contamination_token_hits: regenerate the full token
    streams, then find the FIRST occurrence (0-based) of each benchmark
    pattern via a list-lambda scan (DuckDB list slices are 1-based inclusive:
    tokens[i : i+m-1] is the m-token window starting at i)."""
    m = len(patterns[0])
    if any(len(p) != m for p in patterns):
        raise ValueError("all patterns must share one length")
    # per-pattern branch with an element-wise conjunction (no slice allocs;
    # the AND short-circuits on the first token, so the scan is ~one integer
    # compare per position instead of an m-slice equality)
    branches = []
    for k, p in enumerate(patterns):
        cond = " AND ".join(f"f.tokens[i + {j}] = {t}" for j, t in enumerate(p))
        branches.append(
            f"""SELECT {k} AS pattern_id, f.doc_id,
         CAST(list_filter(range(1, len(f.tokens) - {m} + 2),
                          i -> {cond})[1] - 1 AS INT) AS match_pos
  FROM f1t f"""
        )
    union = "\n  UNION ALL\n  ".join(branches)
    return f"""
WITH {f1_tokens_cte(n_rows, seed)},
hits AS (
  {union})
SELECT pattern_id, doc_id, match_pos
FROM hits WHERE match_pos IS NOT NULL
"""


def benchmark_patterns(
    rows: list[int], m: int = 3, seed: int = 42
) -> list[list[int]]:
    """Deterministic 'benchmark set' for the decontamination fixture: the
    first m tokens of the given row indices (numpy replay of the generator —
    each pattern provably occurs in its origin row at position 0)."""
    from loongcollector_spark.sources.synthetic import _row_key, _splitmix64

    out = []
    for r in rows:
        key = _row_key(np.array([r], dtype=np.int64), seed)[0]
        with np.errstate(over="ignore"):
            toks = [
                int(_splitmix64(np.array([key + np.uint64(j + 1)], dtype=np.uint64))[0]
                    % np.uint64(VOCAB_SIZE))
                for j in range(m)
            ]
        out.append(toks)
    return out


def token_native_rollup_oracle(n_rows: int = 5000, seed: int = 42) -> str:
    """Oracle for queries.token_native_parse_rollup: route on status/level
    extracted straight from header tokens, roll up per (source, sink)."""
    status_arr = _sql_str_array([str(s) for s in _STATUS])
    level_arr = _sql_str_array(list(_LEVELS))
    return f"""
WITH {f1_cte(n_rows, seed, (0, 2, 5))},
fields AS (
  SELECT source, n_tok,
         {status_arr}[(t2 % {len(_STATUS)}) + 1] AS status,
         {level_arr}[(t5 % {len(_LEVELS)}) + 1] AS level
  FROM f1),
routed AS (
  SELECT source, n_tok,
         CASE WHEN regexp_full_match(status, '5\\d\\d') THEN 'errors'
              WHEN regexp_full_match(level, 'WARN|ERROR') THEN 'warns'
              ELSE 'default' END AS sink
  FROM fields)
SELECT source, sink, COUNT(*) AS rows, CAST(SUM(n_tok) AS BIGINT) AS tokens
FROM routed GROUP BY source, sink
"""


def tokenized_pipeline_oracle(n_rows: int = 5000, seed: int = 42) -> str:
    """Oracle for queries.tokenized_pipeline_e2e: detok render emits JSON
    lines only for the app-* family, so parse_json yields `level` there and
    NULL elsewhere; route ERROR -> errors, web-* -> web, else default."""
    level_arr = _sql_str_array(list(_LEVELS))
    return f"""
WITH {f1_cte(n_rows, seed, (5,))},
fields AS (
  SELECT source, n_tok,
         CASE WHEN source LIKE 'app-%'
              THEN {level_arr}[(t5 % {len(_LEVELS)}) + 1] END AS level
  FROM f1),
routed AS (
  SELECT source, n_tok,
         CASE WHEN level = 'ERROR' THEN 'errors'
              WHEN source LIKE 'web-%' THEN 'web'
              ELSE 'default' END AS sink
  FROM fields)
SELECT source, sink, COUNT(*) AS rows, CAST(SUM(n_tok) AS BIGINT) AS tokens
FROM routed GROUP BY source, sink
"""
