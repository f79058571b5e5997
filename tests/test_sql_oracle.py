"""The DuckDB-SQL replica of the F1 generator must be bit-exact vs numpy."""

from __future__ import annotations

import duckdb
import numpy as np

from loongcollector_spark.sources.sql_oracle import f1_cte
from loongcollector_spark.sources.synthetic import (
    SOURCES,
    VOCAB_SIZE,
    _n_tok,
    _row_key,
    _source_idx,
    _splitmix64,
)

N = 20_000
SEED = 42


def test_sql_f1_matches_numpy_generator():
    sql = f"WITH {f1_cte(N, SEED, (0, 2, 5))} SELECT * FROM f1 ORDER BY i"
    con = duckdb.connect()
    rows = con.sql(sql).fetchall()
    assert len(rows) == N

    ids = np.arange(N, dtype=np.int64)
    want_src = np.asarray(SOURCES)[_source_idx(ids, SEED)]
    want_ntok = _n_tok(ids, SEED)
    keys = _row_key(ids, SEED)
    with np.errstate(over="ignore"):
        want = {
            p: (_splitmix64(keys + np.uint64(p + 1)) % np.uint64(VOCAB_SIZE)).astype(np.int64)
            for p in (0, 2, 5)
        }

    got_src = np.array([r[1] for r in rows])
    got_ntok = np.array([r[2] for r in rows])
    assert (got_src == want_src).all()
    assert (got_ntok == want_ntok).all()
    for col, p in ((3, 0), (4, 2), (5, 5)):
        got = np.array([r[col] for r in rows])
        assert (got == want[p]).all(), f"token position {p} diverged"
