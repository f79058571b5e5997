"""Token-native field extraction & subsequence search (operators/token_ops)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from loongcollector_spark.operators.token_ops import (
    TokenField,
    token_field_extract,
    token_subseq_find,
)
from loongcollector_spark.sources import generate_sequences
from loongcollector_spark.sources.synthetic import _METHODS, _STATUS, expected_tokens


def test_token_field_extract_matches_render_semantics(spark):
    """Fields extracted straight from header tokens equal the values the
    detok render would have embedded in the log line (same modular rules)."""
    seqs = generate_sequences(spark, 200, partitions=2)
    out = token_field_extract(
        seqs,
        "tokens",
        {
            "method": TokenField(position=0, vocab=list(_METHODS)),
            "status": TokenField(position=2, vocab=[str(s) for s in _STATUS]),
            "nbytes": TokenField(position=3, modulus=100000, cast="long"),
        },
    ).collect()
    for r in out:
        toks = expected_tokens(r["doc_id"])
        assert r["method"] == _METHODS[toks[0] % len(_METHODS)]
        assert r["status"] == str(_STATUS[toks[2] % len(_STATUS)])
        assert r["nbytes"] == toks[3] % 100000


def test_token_field_extract_is_pure_jvm(spark):
    seqs = generate_sequences(spark, 10, partitions=1)
    plan = token_field_extract(
        seqs, "tokens", {"m": TokenField(position=0, modulus=5)}
    )._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


@pytest.mark.parametrize(
    "row,pat,expect",
    [
        ([5, 1, 2, 3, 9], [1, 2, 3], 1),
        ([1, 2, 3], [1, 2, 3], 0),
        ([3, 2, 1], [1, 2, 3], -1),
        ([1, 2], [1, 2, 3], -1),  # shorter than pattern
        ([7, 7, 1, 2, 1, 2, 3], [1, 2, 3], 4),  # first full occurrence wins
        ([], [1, 2, 3], -1),
    ],
)
def test_token_subseq_find_cases(spark, row, pat, expect):
    df = spark.createDataFrame([(row,)], "tokens array<int>")
    got = token_subseq_find(df, "tokens", pat).collect()[0]["match_pos"]
    assert got == expect


def test_token_subseq_no_cross_row_match(spark):
    """A window spanning two rows' concatenated tokens must NOT match."""
    df = spark.createDataFrame([([8, 1, 2],), ([3, 9],)], "tokens array<int>").coalesce(1)
    rows = token_subseq_find(df, "tokens", [1, 2, 3]).collect()
    assert [r["match_pos"] for r in rows] == [-1, -1]


def test_token_subseq_batch(spark):
    """Planted pattern is found at the planted position over many rows."""
    rng = np.random.default_rng(7)
    data = []
    for i in range(500):
        toks = rng.integers(100, 50000, size=40).tolist()
        pos = int(rng.integers(0, 30))
        plant = i % 3 == 0
        if plant:
            toks[pos : pos + 3] = [11, 22, 33]
        data.append((toks, pos if plant else -1))
    df = spark.createDataFrame(data, "tokens array<int>, expect int")
    got = token_subseq_find(df, "tokens", [11, 22, 33])
    bad = got.filter(
        (F.col("expect") >= 0) & (F.col("match_pos") != F.col("expect"))
    ).count()
    # planted rows must match at or before the planted position (random
    # collisions can only create an EARLIER legitimate occurrence)
    assert got.filter((F.col("expect") >= 0) & (F.col("match_pos") < 0)).count() == 0
    assert got.filter((F.col("expect") >= 0) & (F.col("match_pos") > F.col("expect"))).count() == 0
    _ = bad


def test_token_exact_dedup(spark):
    """Token-array equality dedup: duplicated sequences collapse to one
    keeper (min id) with the right dup_count; uniques stay singletons."""
    from pyspark.sql import functions as F

    from loongcollector_spark.operators.token_ops import token_exact_dedup
    from loongcollector_spark.sources.synthetic import generate_sequences_head

    seqs = generate_sequences_head(spark, 300, head=8)
    dupes = seqs.filter(
        F.substring_index("doc_id", "-", -1).cast("long") < 50
    ).withColumn("doc_id", F.concat("doc_id", F.lit("-copy")))
    out = token_exact_dedup(seqs.unionByName(dupes)).persist()
    assert out.count() == 300
    assert out.filter("dup_count = 2").count() == 50
    # keeper is the min doc_id -> never the '-copy' twin
    assert out.filter(F.col("keeper_id").endswith("-copy")).count() == 0
    out.unpersist()


def test_token_gram_hashes_and_minhash(spark):
    from pyspark.sql import functions as F

    from loongcollector_spark.functions import dedup
    from loongcollector_spark.operators.token_ops import (
        token_gram_hashes,
        token_minhash_lsh,
    )

    df = spark.createDataFrame(
        [(1, [5, 6, 7, 8]), (2, [5, 6]), (3, [9, 5, 6, 7])],
        "id long, tokens array<int>",
    )
    got = {r.id: list(r.g) for r in df.select(
        "id", token_gram_hashes(F.col("tokens"), n=3).alias("g")
    ).collect()}
    B = 1 << 16
    assert got[1] == [(5 * B + 6) * B + 7, (6 * B + 7) * B + 8]
    assert got[2] == []  # shorter than n
    assert got[3][0] == (9 * B + 5) * B + 6
    with pytest.raises(ValueError, match="<= 62"):
        token_gram_hashes(F.col("tokens"), n=4, vocab_bits=16)

    # near-identical token sequences land in the same band with high
    # estimated jaccard; the pair list is symmetric-free (id_a < id_b)
    seqs = spark.createDataFrame(
        [("a", list(range(100, 140))), ("b", [999] + list(range(101, 140))),
         ("c", list(range(5000, 5040)))],
        "doc_id string, tokens array<int>",
    )
    pairs = {(r.id_a, r.id_b): r.est_jaccard
             for r in token_minhash_lsh(seqs, num_hashes=16, bands=4).collect()}
    dedup.release_persisted()
    assert ("a", "b") in pairs
    assert pairs[("a", "b")] > 0.5
    assert all(a < b for a, b in pairs)


def test_token_pack_chunks_spans(spark):
    from loongcollector_spark.operators.token_ops import token_pack_chunks

    df = spark.createDataFrame(
        [("d1", 5, "s"), ("d2", 3, "s"), ("d3", 4, "s"), ("d0", 0, "s")],
        "doc_id string, n_tok int, source string",
    )
    spans = token_pack_chunks(df, chunk_len=4, partition_by="source")
    got = {
        (r.doc_id, r.chunk_id): r.slice_tokens for r in spans.collect()
    }
    # layout (order d1,d2,d3 after the empty doc drops): d1 [0,5) d2 [5,8) d3 [8,12)
    assert got == {
        ("d1", 0): 4, ("d1", 1): 1, ("d2", 1): 3, ("d3", 2): 4,
    }
    per_chunk = {
        (r.chunk_id): (r.n_docs, r.toks)
        for r in spans.groupBy("chunk_id")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("slice_tokens").alias("toks"))
        .collect()
    }
    assert per_chunk == {0: (1, 4), 1: (2, 4), 2: (1, 4)}


def test_token_pack_chunks_partition_independence(spark):
    from loongcollector_spark.operators.token_ops import token_pack_chunks

    df = spark.createDataFrame(
        [("a1", 3, "a"), ("a2", 3, "a"), ("b1", 3, "b")],
        "doc_id string, n_tok int, source string",
    )
    spans = token_pack_chunks(df, chunk_len=4, partition_by="source")
    rows = {(r.source, r.doc_id, r.chunk_id) for r in spans.collect()}
    # each source packs from offset 0 independently
    assert ("b", "b1", 0) in rows
    assert ("a", "a1", 0) in rows and ("a", "a2", 0) in rows and ("a", "a2", 1) in rows


def test_token_subseq_find_multi_matches_single(spark):
    from loongcollector_spark.operators.token_ops import (
        token_subseq_find, token_subseq_find_multi,
    )

    df = spark.createDataFrame(
        [
            ("a", [1, 2, 3, 4, 5]),
            ("b", [9, 9, 1, 2, 9]),
            ("c", []),
            ("d", [2, 3]),
        ],
        "doc_id string, tokens array<int>",
    )
    pats = [[1, 2], [3, 4, 5], [7]]
    multi = {
        r.doc_id: list(r.positions)
        for r in token_subseq_find_multi(df, "tokens", pats, "positions").collect()
    }
    for k, p in enumerate(pats):
        single = {
            r.doc_id: r.pos
            for r in token_subseq_find(df, "tokens", p, "pos").collect()
        }
        assert {d: v[k] for d, v in multi.items()} == single
    assert multi["a"] == [0, 2, -1]
    assert multi["b"] == [2, -1, -1]
    assert multi["c"] == [-1, -1, -1]


def test_token_window_hashes_and_repeated_substrings(spark):
    from loongcollector_spark.operators.token_ops import (
        token_repeated_substrings, token_window_hashes,
    )

    df = spark.createDataFrame(
        [
            ("a", [1, 2, 3, 4, 5]),     # windows: 1234, 2345
            ("b", [9, 2, 3, 4, 5]),     # shares 2345 with a
            ("c", [7, 7]),              # too short for w=3... w=3 windows: none? len2<3
        ],
        "doc_id string, tokens array<int>",
    )
    hs = {
        r.doc_id: list(r.h)
        for r in df.select(
            "doc_id", token_window_hashes(F.col("tokens"), 3).alias("h")
        ).collect()
    }
    B, M = 1_000_003, (1 << 31) - 1

    def poly(ts):
        acc = 0
        for t in ts:
            acc = (acc * B + t) % M
        return acc

    assert hs["a"] == [poly([1, 2, 3]), poly([2, 3, 4]), poly([3, 4, 5])]
    assert hs["b"][1:] == hs["a"][1:]
    assert hs["c"] == []
    rep = {r.gram_hash: r.n_docs
           for r in token_repeated_substrings(df, w=3).collect()}
    assert rep == {poly([2, 3, 4]): 2, poly([3, 4, 5]): 2}


def test_repeated_substrings_within_doc_repeat_not_counted(spark):
    from loongcollector_spark.operators.token_ops import token_repeated_substrings

    df = spark.createDataFrame(
        [("a", [1, 2, 1, 2, 1, 2])], "doc_id string, tokens array<int>"
    )
    # doc repeats its own phrase; df stays 1 -> no output
    assert token_repeated_substrings(df, w=2).count() == 0


def test_token_pack_chunks_tied_order_values(spark):
    """Tied order_col values must NOT share a cumulative offset (the default
    RANGE frame bug): every chunk but the last stays exactly chunk_len."""
    from loongcollector_spark.operators.token_ops import token_pack_chunks

    df = spark.createDataFrame(
        [("d1", 3, "s", 7), ("d2", 3, "s", 7), ("d3", 3, "s", 7)],
        "doc_id string, n_tok int, source string, shard_seq int",
    )
    spans = token_pack_chunks(
        df, chunk_len=4, partition_by="source", order_col="shard_seq"
    ).collect()
    per_chunk: dict = {}
    for r in spans:
        per_chunk[r.chunk_id] = per_chunk.get(r.chunk_id, 0) + r.slice_tokens
    assert per_chunk == {0: 4, 1: 4, 2: 1}  # 9 tokens -> 4,4,1


def test_token_substring_dedup_matches_pure_python(spark):
    """token_substring_dedup == a from-scratch replay of the ExactSubstr
    removal rule: polynomial window hashes, global first-occurrence by
    (doc_id, pos), per-doc span union, rebuild from uncovered positions."""
    from loongcollector_spark.operators.token_ops import token_substring_dedup

    w, base, mod = 3, 1_000_003, (1 << 31) - 1
    rows = [
        ("a", [1, 2, 3, 4, 5]),
        ("b", [7, 1, 2, 3, 9]),       # shares [1,2,3] with a
        ("c", [1, 2, 3]),             # fully covered
        ("d", [4, 5]),                # shorter than w — untouched
        ("e", [6, 6, 6, 6, 6]),       # self-repeats keep first window only
        ("f", [3, 4, 5, 1, 2, 3]),    # two cuts: [3,4,5] and [1,2,3]
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")

    def win_hashes(toks):
        out = []
        for p in range(len(toks) - w + 1):
            acc = 0
            for t in toks[p : p + w]:
                acc = (acc * base + t) % mod
            out.append((p, acc))
        return out

    firsts: dict[int, tuple[str, int]] = {}
    for i, toks in sorted(rows):
        for p, h in win_hashes(toks):
            firsts.setdefault(h, (i, p))
    expected = {}
    for i, toks in rows:
        cuts = [p for p, h in win_hashes(toks) if firsts[h] != (i, p)]
        kept = [
            t for p, t in enumerate(toks)
            if not any(s <= p < s + w for s in cuts)
        ]
        expected[i] = (len(toks), len(toks) - len(kept), kept)

    got = {
        r["doc_id"]: (r["n_tok"], r["n_removed"], list(r["tokens_clean"]))
        for r in token_substring_dedup(df, w=w).collect()
    }
    assert got == expected
    assert got["c"] == (3, 3, [])          # fully covered survives as empty
    assert got["d"] == (2, 0, [4, 5])      # short doc untouched
    assert got["e"] == (5, 4, [6])


def test_token_substring_dedup_plan_shape(spark):
    """Three linear exchanges (hash window, cut collection, spine join),
    no global sort, no Python eval."""
    from loongcollector_spark.operators.token_ops import token_substring_dedup

    df = spark.createDataFrame(
        [("a", [1, 2, 3, 4])], "doc_id string, tokens array<int>"
    )
    out = token_substring_dedup(df, w=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 3
    assert "rangepartitioning" not in plan.lower()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ------------------------------------------------------------ BPE primitives


def _py_bpe_merge(seq, a, b, nid):
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(nid)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def _bpe_corpus(spark, n=300, alpha=4, seed=11):
    import random

    rng = random.Random(seed)
    rows = [
        (str(i), [rng.randrange(alpha) for _ in range(rng.randrange(0, 14))])
        for i in range(n)
    ]
    rows += [("nul", None), ("emp", []), ("run", [2, 2, 2, 2, 2])]
    return rows, spark.createDataFrame(rows, "doc_id string, tokens array<int>")


def test_token_pair_counts_matches_pure_python(spark):
    from collections import Counter

    from loongcollector_spark.operators.token_ops import token_pair_counts

    rows, df = _bpe_corpus(spark)
    want = Counter()
    for _, seq in rows:
        for x, y in zip(seq or [], (seq or [])[1:]):
            want[(x, y)] += 1
    got = {
        (r.a, r.b): r.pair_count for r in token_pair_counts(df).collect()
    }
    assert got == dict(want)


def test_token_pair_counts_top_k_deterministic(spark):
    from loongcollector_spark.operators.token_ops import token_pair_counts

    _, df = _bpe_corpus(spark)
    head = [tuple(r) for r in token_pair_counts(df, top_k=5).collect()]
    again = [tuple(r) for r in token_pair_counts(df, top_k=5).collect()]
    assert head == again and len(head) == 5
    counts = [c for _, _, c in head]
    assert counts == sorted(counts, reverse=True)


def test_token_pair_counts_is_pure_jvm(spark):
    from loongcollector_spark.operators.token_ops import token_pair_counts

    _, df = _bpe_corpus(spark)
    plan = token_pair_counts(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # no Python UDF in the pair relation


@pytest.mark.parametrize("pair", [(1, 2), (2, 2), (0, 0), (3, 1)])
def test_token_bpe_merge_matches_pure_python(spark, pair):
    from loongcollector_spark.operators.token_ops import token_bpe_merge

    rows, df = _bpe_corpus(spark)
    a, b = pair
    got = {
        r.doc_id: (None if r.m is None else list(r.m))
        for r in token_bpe_merge(df, pair, 99, dest="m").collect()
    }
    for did, seq in rows:
        want = None if seq is None else _py_bpe_merge(seq, a, b, 99)
        assert got[did] == want, (did, seq, got[did], want)


def test_token_bpe_merge_run_parity(spark):
    """aaaa with pair (a,a) merges greedily left-to-right: [new, new]."""
    from loongcollector_spark.operators.token_ops import token_bpe_merge

    df = spark.createDataFrame(
        [("r4", [2, 2, 2, 2]), ("r5", [2, 2, 2, 2, 2])],
        "doc_id string, tokens array<int>",
    )
    got = {
        r.doc_id: list(r.tokens)
        for r in token_bpe_merge(df, (2, 2), 9).collect()
    }
    assert got == {"r4": [9, 9], "r5": [9, 9, 2]}


def test_bpe_training_iterations_compose(spark):
    """Three rounds of count-top-pair -> merge reproduce the pure-Python BPE
    trainer on the same corpus (ties broken by (count DESC, a, b))."""
    from collections import Counter

    from loongcollector_spark.operators.token_ops import (
        token_bpe_merge,
        token_pair_counts,
    )

    rows, df = _bpe_corpus(spark, n=120, alpha=3, seed=23)
    py = {d: list(s) if s is not None else None for d, s in rows}
    next_id = 100
    for _ in range(3):
        top = token_pair_counts(df, top_k=1).collect()[0]
        counts = Counter()
        for s in py.values():
            for x, y in zip(s or [], (s or [])[1:]):
                counts[(x, y)] += 1
        want_pair = min(counts, key=lambda p: (-counts[p], p))
        assert (top.a, top.b) == want_pair
        assert top.pair_count == counts[want_pair]
        df = token_bpe_merge(df, (top.a, top.b), next_id)
        py = {
            d: None if s is None else _py_bpe_merge(s, top.a, top.b, next_id)
            for d, s in py.items()
        }
        next_id += 1
    got = {r.doc_id: (None if r.tokens is None else list(r.tokens))
           for r in df.collect()}
    assert got == py


def _py_bpe_train(rows, n_merges, start_id):
    """Pure-Python reference trainer: max count, ties -> smallest (a, b)."""
    from collections import Counter

    py = {d: (None if s is None else list(s)) for d, s in rows}
    merges = []
    for step in range(n_merges):
        counts = Counter()
        for s in py.values():
            for x, y in zip(s or [], (s or [])[1:]):
                counts[(x, y)] += 1
        if not counts:
            break
        a, b = min(counts, key=lambda p: (-counts[p], p))
        nid = start_id + step
        merges.append((a, b, nid, counts[(a, b)]))
        py = {
            d: None if s is None else _py_bpe_merge(s, a, b, nid)
            for d, s in py.items()
        }
    return merges, py


def test_bpe_train_matches_pure_python(spark, tmp_path):
    """bpe_train (driver loop over the distributed kernels, lineage cut per
    iteration) reproduces the reference trainer's merge table AND final
    corpus — alphabet 3 forces a==b winners through the run-parity path."""
    from loongcollector_spark.operators.token_ops import bpe_train

    rows, df = _bpe_corpus(spark, n=150, alpha=3, seed=7)
    want_merges, want_corpus = _py_bpe_train(rows, 5, start_id=3)
    got_merges, final = bpe_train(df, 5, start_id=3)
    assert got_merges == want_merges
    got = {r.doc_id: (None if r.tokens is None else list(r.tokens))
           for r in final.collect()}
    assert got == want_corpus
    # spill_dir variant truncates lineage through parquet, same result
    got_merges2, final2 = bpe_train(
        df, 5, start_id=3, spill_dir=str(tmp_path), checkpoint_every=2
    )
    assert got_merges2 == want_merges
    got2 = {r.doc_id: (None if r.tokens is None else list(r.tokens))
            for r in final2.collect()}
    assert got2 == want_corpus
    # superseded spill snapshots are cleaned up: only the LAST checkpoint
    # remains on disk (O(1) corpus copies, not O(n_merges/checkpoint_every))
    import os as _os

    dirs = [d for d in _os.listdir(tmp_path) if d.startswith("bpe_iter_")]
    assert dirs == ["bpe_iter_4"], dirs


def test_bpe_apply_replays_training(spark):
    """Re-tokenizing the ORIGINAL corpus under the learned merge table (in
    table order = merge priority) reproduces the trained corpus exactly —
    the merge table is the tokenizer."""
    from loongcollector_spark.operators.token_ops import bpe_apply, bpe_train

    rows, df = _bpe_corpus(spark, n=100, alpha=3, seed=19)
    merges, final = bpe_train(df, 4, start_id=3)
    replayed = bpe_apply(df, [(a, b, n) for a, b, n, _ in merges],
                         checkpoint_every=2)
    want = {r.doc_id: (None if r.tokens is None else list(r.tokens))
            for r in final.collect()}
    got = {r.doc_id: (None if r.tokens is None else list(r.tokens))
           for r in replayed.collect()}
    assert got == want


def test_bpe_train_sql_oracle_run_parity():
    """The DuckDB replay of the training loop handles a == b winners with
    the same greedy run-parity rule as the Spark kernel: drive the
    generated stage SQL over a handcrafted corpus whose first winner is
    (2, 2) and compare the whole 2-round result to the pure-Python
    trainer."""
    import duckdb

    from loongcollector_spark.queries import _bpe_train_sql

    rows = [
        ("r1", [2, 2, 2, 2, 2]),
        ("r2", [2, 2, 2, 2]),
        ("r3", [2, 2, 1, 2, 2]),
        ("r4", [1, 0, 1, 0]),
        ("r5", []),
    ]
    vals = ", ".join(
        f"('{d}', {s if s else 'CAST([] AS INT[])'})" for d, s in rows
    )
    prefix = f"WITH corpus_0(doc_id, t) AS (SELECT * FROM (VALUES {vals}))"
    got = duckdb.sql(_bpe_train_sql(2, corpus_prefix=prefix, start_id=9)).fetchall()
    want_merges, _ = _py_bpe_train(rows, 2, start_id=9)
    assert got == [
        (i + 1, a, b, nid, cnt) for i, (a, b, nid, cnt) in enumerate(want_merges)
    ]
    assert got[0][1:3] == (2, 2)  # the parity path actually fired


def test_bpe_train_sql_oracle_final_corpus_matches_python():
    """Beyond the merge table: the SQL rewrite's FINAL corpus equals the
    pure-Python trainer's, a==b chains included (corpus_k exposed by
    selecting it instead of the winner union)."""
    import duckdb

    from loongcollector_spark.queries import _bpe_train_sql

    rows = [
        ("r1", [3, 3, 3, 3, 3, 1, 3, 3]),
        ("r2", [3, 3, 1, 3, 3, 1, 3, 3]),
        ("r3", [1, 3, 3, 3]),
        ("r4", [2, 1, 2, 1]),
    ]
    vals = ", ".join(f"('{d}', {s})" for d, s in rows)
    prefix = f"WITH corpus_0(doc_id, t) AS (SELECT * FROM (VALUES {vals}))"
    sql = _bpe_train_sql(3, corpus_prefix=prefix, start_id=50)
    # swap the final winner-union select for the final corpus
    body = sql[: sql.rindex("\nSELECT CAST(1")]
    got = {
        d: list(t)
        for d, t in duckdb.sql(
            body + "\nSELECT doc_id, t FROM corpus_3"
        ).fetchall()
    }
    _, want = _py_bpe_train(rows, 3, start_id=50)
    assert got == want


def test_bpe_train_sql_oracle_dry_round_preserves_corpus():
    """A training round with NO remaining adjacent pairs (empty winner CTE)
    must pass the corpus through unchanged — matching bpe_train's
    break-and-return — not wipe it: the stage rewrite joins the winner with
    LEFT JOIN ON TRUE, so an empty winner leaves every row intact and the
    merge-table union simply stops early. Regression: the original CROSS
    JOIN emptied corpus_{s+1} and every later corpus."""
    import duckdb

    from loongcollector_spark.queries import _bpe_train_sql

    # After merge 1 ([0,1] -> 50) the corpus is single-token rows: round 2
    # is dry.
    prefix = (
        "WITH corpus_0(doc_id, t) AS "
        "(SELECT * FROM (VALUES ('a', [0, 1]), ('b', [0, 1])))"
    )
    sql = _bpe_train_sql(3, corpus_prefix=prefix, start_id=50)
    assert duckdb.sql(sql).fetchall() == [(1, 0, 1, 50, 2)]
    body = sql[: sql.rindex("\nSELECT CAST(1")]
    for k in (1, 2, 3):
        got = {
            d: list(t)
            for d, t in duckdb.sql(
                body + f"\nSELECT doc_id, t FROM corpus_{k}"
            ).fetchall()
        }
        assert got == {"a": [50], "b": [50]}, f"corpus_{k} diverged"


def test_bpe_train_empty_corpus_raises(spark):
    from loongcollector_spark.operators.token_ops import bpe_train

    df = spark.createDataFrame(
        [("a", []), ("b", None)], "doc_id string, tokens array<int>"
    )
    with pytest.raises(ValueError, match="no tokens"):
        bpe_train(df, 1)


def _bfd_reference(pieces, capacity):
    """Plain-Python Best-Fit-Decreasing over (doc_id, piece_id, size)."""
    order = sorted(pieces, key=lambda p: (-p[2], p[0], p[1]))
    caps, out = [], {}
    for doc, pid, size in order:
        fits = [(c, j) for j, c in enumerate(caps) if c >= size]
        if fits:
            _, j = min(fits, key=lambda t: (t[0], t[1]))
            caps[j] -= size
        else:
            caps.append(capacity - size)
            j = len(caps) - 1
        out[(doc, pid)] = j
    return out, caps


def test_token_pack_bestfit_hand_example(spark):
    from loongcollector_spark.operators.token_ops import token_pack_bestfit

    # sizes desc: a=7, b=6, c=4, d=3, e=2 into capacity 10:
    # a->bin0(rem 3), b->bin1(rem 4), c->bin1(rem 0), d->bin0(rem 0),
    # e->bin2 (new)
    rows = [("s", "a", 7), ("s", "b", 6), ("s", "c", 4), ("s", "d", 3),
            ("s", "e", 2)]
    df = spark.createDataFrame(rows, "source string, doc_id string, n_tok int")
    got = {
        r["doc_id"]: r["bin_id"]
        for r in token_pack_bestfit(df, capacity=10).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 1, "d": 0, "e": 2}


def test_token_pack_bestfit_oversize_prechunk(spark):
    from loongcollector_spark.operators.token_ops import token_pack_bestfit

    # n=25 at capacity 10 -> pieces 10,10,5; n=10 exactly -> one piece of 10
    df = spark.createDataFrame(
        [("s", "big", 25), ("s", "exact", 10)],
        "source string, doc_id string, n_tok int",
    )
    out = token_pack_bestfit(df, capacity=10).collect()
    sizes = sorted((r["doc_id"], r["piece_id"], r["piece_tokens"]) for r in out)
    assert sizes == [("big", 0, 10), ("big", 1, 10), ("big", 2, 5),
                     ("exact", 0, 10)]
    # every bin fill <= capacity, full pieces each alone in their bin
    fills = {}
    for r in out:
        fills[r["bin_id"]] = fills.get(r["bin_id"], 0) + r["piece_tokens"]
    assert all(v <= 10 for v in fills.values())


def test_token_pack_bestfit_invariants_and_reference_parity(spark):
    import numpy as np

    from loongcollector_spark.operators.token_ops import token_pack_bestfit

    rng = np.random.RandomState(7)
    rows = [
        (f"sh{i % 3}", f"d{i:04d}", int(rng.randint(1, 30)))
        for i in range(120)
    ]
    cap = 16
    df = spark.createDataFrame(rows, "source string, doc_id string, n_tok int")
    out = token_pack_bestfit(df, capacity=cap).collect()

    # piece mass conservation
    assert sum(r["piece_tokens"] for r in out) == sum(n for _, _, n in rows)

    by_shard: dict[str, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        # bin fill <= capacity; bin ids contiguous from 0
        fills: dict[int, int] = {}
        for r in rs:
            fills[r["bin_id"]] = fills.get(r["bin_id"], 0) + r["piece_tokens"]
        assert all(v <= cap for v in fills.values())
        assert sorted(fills) == list(range(len(fills)))
        # exact parity with the plain-Python BFD reference
        pieces = []
        for _, doc, n in (t for t in rows if t[0] == shard):
            fullp, rem = divmod(n, cap)
            sizes = [cap] * fullp + ([rem] if rem else [])
            pieces += [(doc, pid, s) for pid, s in enumerate(sizes)]
        expect, _ = _bfd_reference(pieces, cap)
        got = {(r["doc_id"], r["piece_id"]): r["bin_id"] for r in rs}
        assert got == expect, f"shard {shard} diverged"


def test_token_pack_bestfit_rejects_bad_capacity(spark):
    from loongcollector_spark.operators.token_ops import token_pack_bestfit

    df = spark.createDataFrame([("s", "a", 1)],
                               "source string, doc_id string, n_tok int")
    with pytest.raises(ValueError, match="capacity"):
        token_pack_bestfit(df, capacity=0)


def test_token_pack_bestfit_bigint_ids(spark):
    """Non-string id/shard columns must work — the operator casts to string
    before the Arrow boundary instead of crashing mid-job."""
    from loongcollector_spark.operators.token_ops import token_pack_bestfit

    df = spark.createDataFrame(
        [(1, 101, 7), (1, 102, 6), (2, 103, 4)],
        "source int, doc_id bigint, n_tok int",
    )
    out = token_pack_bestfit(df, capacity=10).collect()
    assert {(r["shard"], r["doc_id"]) for r in out} == {
        ("1", "101"), ("1", "102"), ("2", "103")
    }
    assert all(r["bin_id"] >= 0 for r in out)
