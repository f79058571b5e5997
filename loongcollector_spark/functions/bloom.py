"""Broadcast Bloom-filter membership — join-free benchmark decontamination.

The contamination scan in ``operators/token_ops.py`` matches K known
benchmark patterns in one Arrow pass; that works while the benchmark suite
is small enough to inline. This module is the scale path for the other
regime — a benchmark/blocklist corpus with millions-to-billions of n-grams,
where the standard design (shuffle-join the 100 TB corpus' shingles against
a benchmark-shingle table) pays a full exchange of the big side. A Bloom
bitset of the benchmark shingles is built ONCE (bounded, tiny next to the
corpus), broadcast to every executor, and membership is tested map-side —
the corpus never shuffles at all.

Determinism/replayability: positions are md5-derived (two independent
60-bit slices of the digest, mod ``m_bits``), so an external engine can
rebuild the identical bitset and replay membership EXACTLY — including the
false positives, which are a deterministic function of (benchmark set,
m_bits). DuckDB oracle shape::

    p1 = ('0x' || substr(md5(g), 1, 15))::BIGINT % m
    p2 = ('0x' || substr(md5(g), 17, 15))::BIGINT % m
    hit(g) := p1 IN bits AND p2 IN bits   -- bits = distinct p1 ∪ p2 of the
                                          --        benchmark shingles

k=2 hash functions: false-positive rate (1 - e^{-2n/m})^2; at the default
m=2^18 with n=10^4 benchmark shingles that is ~0.5%, and honesty about FPs
is the point — the oracle reproduces every one of them.

Reference tie-in: the collector's static filter chain
(``core/plugin/processor/ProcessorFilterNative.cpp``) is the per-event
include/exclude twin; this is the corpus-scale set-membership version where
the "config" (benchmark set) is too large to inline in the plan.

Scale notes (documented, not speculative): the driver-side build collects
DISTINCT bit positions — bounded by ``m_bits`` (2^18 default = at most
262k longs ≈ 2 MB; the packed bitset itself is 32 KiB). For a benchmark
suite needing m ≥ 2^30, swap the collect for a per-partition numpy-bitset
OR tree-reduce (the positions never materialize as rows); the membership
side is unchanged — the bitset rides to executors once per job either way.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_positions(
    gram: Column, m_bits: int, hash: str = "md5"
) -> tuple[Column, Column]:
    """The two bit positions of a gram. ``hash="md5"`` (default, the
    oracle twin): independent 60-bit md5 slices (chars 1-15 and 17-31 of
    the hex digest) mod ``m_bits``. ``hash="xxh64"`` (production): two
    independent seeded xxhash64 passes — one codegen'd streaming hash per
    position instead of a cryptographic digest + hex/radix trip; not
    externally replayable."""
    if hash == "xxh64":
        p1 = F.pmod(F.xxhash64(gram), F.lit(m_bits)).cast("long")
        p2 = F.pmod(F.xxhash64(gram, F.lit(1)), F.lit(m_bits)).cast("long")
        return p1, p2
    if hash != "md5":
        raise ValueError(f"hash must be 'md5' or 'xxh64', got {hash!r}")
    h = F.md5(gram)
    p1 = F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % m_bits
    p2 = F.conv(F.substring(h, 17, 15), 16, 10).cast("long") % m_bits
    return p1, p2


def _md5_pos_structs(grams: Column, m_bits: int) -> Column:
    """array<struct<p1,p2>> of Bloom positions with ONE md5 per gram: the
    digest is produced by an inner ``transform`` and both 60-bit slices read
    the bound lambda variable — two naive position transforms would hash
    every gram twice, and Spark does not CSE inside higher-order functions
    (the word_ngrams lesson, functions/text.py)."""
    digests = F.transform(grams, F.md5)
    return F.transform(
        digests,
        lambda h: F.struct(
            (F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % m_bits)
            .alias("p1"),
            (F.conv(F.substring(h, 17, 15), 16, 10).cast("long") % m_bits)
            .alias("p2"),
        ),
    )


def build_bloom_bits(
    bench: DataFrame, grams_col: str, m_bits: int = 1 << 18, hash: str = "md5"
) -> np.ndarray:
    """Packed uint8 bitset (little-bit-endian within a byte: bit ``p`` is
    ``bits[p >> 3] & (1 << (p & 7))``) of every position of every gram in
    ``bench[grams_col]`` (array<string> per row).

    One narrow explode + a DISTINCT bounded by ``m_bits`` — the only
    exchange in the build is over unique positions, never over grams."""
    g = bench.select(F.explode(grams_col).alias("g"))
    p1, p2 = bloom_positions(F.col("g"), m_bits, hash)
    pos = (
        g.select(F.explode(F.array(p1, p2)).alias("p"))
        .distinct()
        .toPandas()["p"]
        .to_numpy(dtype=np.int64)
    )
    bits = np.zeros((m_bits + 7) >> 3, dtype=np.uint8)
    np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return bits


def bloom_hits_expr(bits: np.ndarray, m_bits: int):
    """Returns a callable mapping two array<long> position columns to the
    count of grams whose BOTH positions are set — one numpy pipeline per
    Arrow batch (flatten + gather + reduceat), no per-row Python.

    The bitset is captured in the UDF closure: cloudpickled once into the
    task binary and shared by every batch an executor processes."""
    from pyspark.sql.functions import pandas_udf

    if len(bits) != (m_bits + 7) >> 3:
        raise ValueError(
            f"bitset/m_bits mismatch: len(bits)={len(bits)} but m_bits="
            f"{m_bits} needs {(m_bits + 7) >> 3} bytes"
        )

    @pandas_udf("long")
    def hits(p1s: pd.Series, p2s: pd.Series) -> pd.Series:
        lengths = p1s.map(lambda v: 0 if v is None else len(v)).to_numpy(
            dtype=np.int64
        )
        out = np.zeros(len(p1s), dtype=np.int64)
        if lengths.sum() == 0:
            return pd.Series(out)
        f1 = np.concatenate(
            [np.asarray(v, dtype=np.int64) for v in p1s if v is not None and len(v)]
        )
        f2 = np.concatenate(
            [np.asarray(v, dtype=np.int64) for v in p2s if v is not None and len(v)]
        )
        hit = (
            (bits[f1 >> 3] >> (f1 & 7).astype(np.uint8)) & 1
        ) & ((bits[f2 >> 3] >> (f2 & 7).astype(np.uint8)) & 1)
        starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])[lengths > 0]
        seg = np.add.reduceat(hit.astype(np.int64), starts.astype(np.int64))
        out[lengths > 0] = seg
        return pd.Series(out)

    return hits


def bloom_decontaminate(
    corpus: DataFrame,
    grams_col: str,
    id_col: str,
    bench: DataFrame,
    bench_grams_col: str | None = None,
    m_bits: int = 1 << 18,
    hash: str = "md5",
) -> DataFrame:
    """Flag corpus rows whose gram array (array<string>) hits the Bloom
    bitset of the benchmark grams: returns
    ``(id_col, n_grams:long, n_hits:long)`` for rows with >= 1 hit.

    The corpus side is a pure scan→project→filter: gram hashing is JVM
    ``transform``s, the membership test is the broadcast-bitset pandas UDF,
    and nothing about the corpus is ever exchanged (the output is a filter
    of the input rows, not an aggregate)."""
    bench_grams_col = bench_grams_col or grams_col
    bits = build_bloom_bits(bench, bench_grams_col, m_bits, hash)
    g = F.col(grams_col)
    # The UDF is semantically deterministic, but letting Catalyst treat it
    # as such pushes the `n_hits > 0` filter below the projection and
    # re-evaluates the whole hash+membership pipeline TWICE (once for the
    # filter, once for the output). asNondeterministic() is purely an
    # optimizer barrier here: one ArrowEvalPython, one gram-hash transform.
    hits = bloom_hits_expr(bits, m_bits).asNondeterministic()
    if hash == "md5":
        # Stage the array<struct<p1,p2>> in its own projection so the
        # digest transform stays single-evaluated: CollapseProject declines
        # to inline a non-cheap expression referenced twice above, whereas
        # two independent position transforms would md5 every gram twice
        # (md5 dominates this scan at 20M+ rows — see BENCH.md).
        staged = corpus.select(
            F.col(id_col),
            F.size(g).cast("long").alias("n_grams"),
            _md5_pos_structs(g, m_bits).alias("_ps"),
        )
        flagged = staged.select(
            id_col,
            "n_grams",
            hits(
                F.col("_ps").getField("p1"), F.col("_ps").getField("p2")
            ).alias("n_hits"),
        )
    else:
        p1 = F.transform(g, lambda x: bloom_positions(x, m_bits, hash)[0])
        p2 = F.transform(g, lambda x: bloom_positions(x, m_bits, hash)[1])
        flagged = corpus.select(
            F.col(id_col),
            F.size(g).cast("long").alias("n_grams"),
            hits(p1, p2).alias("n_hits"),
        )
    return flagged.filter(F.col("n_hits") > 0)
