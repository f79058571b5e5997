"""Deduplication for training-data pipelines: exact, n-gram Jaccard,
MinHash+LSH, SimHash.

Scale design:
- exact dedup is one hash-groupBy (map-side combine keeps the shuffle tiny —
  only (hash, min_id, count) partials move).
- n-gram Jaccard avoids the O(n²) cross join via an inverted shingle index:
  explode shingles → self-join on shingle → per-pair common counts. At 100TB
  add a document-frequency cut (drop shingles appearing in >df_max docs) —
  exposed as ``max_shingle_df``.
- MinHash+LSH: k permutations via (a*x+b) mod p over xxhash64 shingles —
  pure column expressions; bands are arrays sliced from the signature; the
  candidate join is an equi-join on (band_idx, band_hash) — exactly the
  banding scheme from the MMDS literature.
- SimHash: 64-bit signature from per-token hashes; near-dup = small Hamming
  distance within LSH buckets on signature prefixes.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^61-1 for the universal-hash permutations
_MERSENNE = (1 << 61) - 1

# Relations persisted by dedup plans (both sides of the self-joins reference
# them). Spark cannot unpersist lazily-correct at plan build time, so callers
# materialize the returned DataFrame and then call release_persisted() —
# otherwise repeated calls accumulate cached blocks until eviction pressure.
_PERSISTED: list[DataFrame] = []


def _track_persist(df: DataFrame) -> DataFrame:
    p = df.persist()
    _PERSISTED.append(p)
    return p


def release_persisted() -> None:
    """Unpersist every intermediate cached by dedup plan builders. Call after
    the returned DataFrame has been materialized (collect/write)."""
    while _PERSISTED:
        try:
            _PERSISTED.pop().unpersist()
        except Exception:
            pass


def md5_hash60(col: Column) -> Column:
    """60-bit positive gram hash from md5 — slower than xxhash64 but exactly
    reproducible in DuckDB (``('0x'||substr(md5(g),1,15))::BIGINT``), used by
    the oracle-paired query variants. Production default stays xxhash64."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles (distinct) as an array<string>.

    Same arrays_zip-of-shifted-slices shape as hashed_shingles below (and
    for the same reason): slicing ``ws`` inside a transform lambda would
    recompute the whole split per gram — O(words²) per doc."""
    ws = F.filter(F.split(F.lower(col), r"\s+"), lambda w: w != "")
    sz = F.size(ws)
    zipped = F.arrays_zip(*[F.slice(ws, 1 + k, sz - (n - 1)) for k in range(n)])
    grams = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(k)] for k in range(n)])
    )
    return F.array_distinct(F.when(sz >= n, grams).otherwise(F.array()))


def hashed_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram hashes as array<long> WITHOUT materializing the
    shingle strings: hash each word once, then xxhash64 over the n
    consecutive word hashes per position. Equivalent as a MinHash/SimHash
    gram universe to hashing the joined strings (any 64-bit gram id works),
    but allocation-free — no per-position slice/join strings, and the
    distinct runs over primitive longs. This is the production gram path;
    the string form stays for the md5 oracle-replay twins.

    Shape matters: the n-gram window is built by arrays_zip of n SHIFTED
    SLICES of the word-hash array, so ``wh`` appears exactly n times per
    ROW. The tempting per-position form (transform over an index sequence
    with F.get(wh, i+k)) embeds ``wh`` in the lambda body, and Spark does
    not common-subexpression-eliminate inside higher-order functions — the
    word-hash array is recomputed per element access, O(words²) per doc
    (measured 44s vs 2.5s on 200k docs)."""
    ws = F.filter(F.split(F.lower(col), r"\s+"), lambda w: w != "")
    wh = F.transform(ws, lambda w: F.xxhash64(w))
    sz = F.size(wh)
    zipped = F.arrays_zip(*[F.slice(wh, 1 + k, sz - (n - 1)) for k in range(n)])
    grams = F.transform(
        zipped, lambda s: F.xxhash64(*[s[str(k)] for k in range(n)])
    )
    return F.array_distinct(F.when(sz >= n, grams).otherwise(F.array()))


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup via content-hash groupBy: one row per distinct content,
    keeper = min id, dup_count recorded."""
    return (
        df.withColumn("__h__", F.md5(F.col(text_col)))
        .groupBy("__h__")
        .agg(
            F.min(F.col(id_col)).alias("keeper_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .withColumnRenamed("__h__", "content_md5")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = 256,
) -> DataFrame:
    """Near-dup pairs with n-gram Jaccard >= threshold, computed via an
    inverted shingle index (no cross join). Returns (id_a, id_b, jaccard)
    with id_a < id_b.

    ``max_shingle_df`` (document-frequency cut, DEFAULT 256) drops shingles
    appearing in more than that many docs from the candidate index: one
    boilerplate phrase shared by df docs otherwise yields O(df²) candidate
    pairs — a scale-killer at corpus size. The cut makes ``common`` (and thus
    jaccard) a lower bound for pairs whose overlap includes hot shingles;
    pass ``None`` only on corpora known to be boilerplate-free."""
    # shingling multiplies row volume ~(words)×: spread the input across the
    # cluster BEFORE the explosion, whatever the scan's file-split count was
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism, F.col(id_col))
    sh = df.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), n).alias("sh")
    ).filter(F.size("sh") > 0)
    # the inverted index feeds both sides of the pair join, the df-cut, AND
    # the per-doc sizes: persist it so shingling runs exactly once (deriving
    # sizes from `sh` instead would re-shingle the corpus once per broadcast)
    inv = _track_persist(sh.select("id", F.explode("sh").alias("g")))
    # shingles are distinct per doc, so n_sh == exploded row count
    sizes = inv.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    if max_shingle_df:
        df_counts = inv.groupBy("g").count().filter(F.col("count") <= max_shingle_df)
        inv = inv.join(df_counts.select("g"), "g")
    pairs = (
        inv.alias("a")
        .join(inv.alias("b"), "g")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    # sizes is one row per doc (ids + one int) — broadcast both lookup joins
    # so the (potentially huge) candidate-pair set never shuffles for them
    return (
        pairs.join(F.broadcast(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a")), "id_a")
        .join(F.broadcast(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b")), "id_b")
        .withColumn(
            "jaccard",
            (F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common"))).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


_P31 = (1 << 31) - 1  # Mersenne prime 2^31-1: products of 31-bit values fit u64


def minhash_coeffs(num_hashes: int, seed: int = 42) -> tuple[list[int], list[int]]:
    """The (a, b) universal-hash coefficients for the k permutations —
    exposed so oracle SQL can inline the exact same constants."""
    import random

    rng = random.Random(seed)
    a = [rng.randrange(1, _P31) for _ in range(num_hashes)]
    b = [rng.randrange(0, _P31) for _ in range(num_hashes)]
    return a, b


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
    gram_hash: Callable[[Column], Column] = F.xxhash64,
) -> DataFrame:
    """MinHash + LSH banding: candidate pairs that share at least one band.
    Returns (id_a, id_b, est_jaccard) where est_jaccard = fraction of equal
    signature positions (the MinHash estimate). ``gram_hash`` maps a shingle
    to a non-negative-ish long (default xxhash64 — fastest; pass
    ``md5_hash60`` for cross-engine-reproducible signatures).

    No upfront repartition: shingle+hash runs on the scan partitions, and
    the signature groupBy's map-side combine means the only doc-count-sized
    shuffle moves (id, k longs) rows — never the text."""
    grams = _gram_hashes(df, text_col, id_col, n, gram_hash)
    return minhash_lsh_from_gram_hashes(grams, num_hashes, bands, seed)


def _gram_hashes(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    gram_hash: Callable[[Column], Column],
) -> DataFrame:
    """(id, gh:array<long>) shingle-hash relation — the single dispatch
    point for the gram hash, shared by the self-join dedup path and the
    cross-corpus decontamination path so their signatures can never
    diverge. xxhash64 takes the string-free fast path."""
    if gram_hash is F.xxhash64:
        gh = hashed_shingles(F.col(text_col), n)
    else:
        gh = F.transform(shingles(F.col(text_col), n), lambda g: gram_hash(g))
    return df.select(F.col(id_col).alias("id"), gh.alias("gh"))


def minhash_signatures(
    grams: DataFrame, num_hashes: int = 32, seed: int = 42
) -> DataFrame:
    """(id, sig:array<long>) MinHash signatures, computed entirely JVM-side:
    explode the gram hashes and run k min-aggregates under whole-stage
    codegen. The groupBy gets map-side partial aggregation, so the shuffle
    (if the input isn't already hash-partitioned by id) moves only
    ids × k longs — never the gram rows. This replaced an Arrow pandas UDF
    that was ~7× slower end-to-end: the outer-product numpy formulation kept
    32 Python workers busier than the whole rest of the plan.

    Bit-exact with the previous numpy uint64 formulation: numpy reduced
    ``uint64(gh) % (2^31-1)``; for gh < 0 the uint64 view adds 2^64, and
    2^64 ≡ 4 (mod 2^31-1), hence the +4 branch below. Products then fit in
    62 bits, so plain signed-long arithmetic matches uint64 arithmetic."""
    a_l, b_l = minhash_coeffs(num_hashes, seed)
    p = F.lit(_P31)
    g = F.col("g")
    h31 = F.pmod(F.pmod(g, p) + F.when(g < 0, F.lit(4)).otherwise(F.lit(0)), p)
    exploded = grams.select("id", F.explode("gh").alias("g")).select(
        "id", h31.alias("h")
    )
    mins = [
        F.min(F.pmod(F.col("h") * F.lit(a_l[k]) + F.lit(b_l[k]), p)).alias(f"_m{k}")
        for k in range(num_hashes)
    ]
    return (
        exploded.groupBy("id")
        .agg(*mins)
        .select("id", F.array(*[f"_m{k}" for k in range(num_hashes)]).alias("sig"))
    )


def _banded_keys(sig: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """(id, band, bh) band-bucket keys from an (id, sig) signature relation —
    bh is xxhash64 of the band's slice rendered as a string, so two docs land
    in the same bucket iff the slice values are equal."""
    return sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice(
                                    F.col("sig"), b * rows_per_band + 1, rows_per_band
                                ),
                                lambda v: v.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("bh"),
                ),
            )
        ).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))


def minhash_lsh_from_gram_hashes(
    grams: DataFrame, num_hashes: int = 32, bands: int = 8, seed: int = 42
) -> DataFrame:
    """Banding over a precomputed (id, gh:array<long>) gram-hash relation —
    the shared core of the text and token-native MinHash paths."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows_per_band = num_hashes // bands
    # The banded self-join references this relation on BOTH sides; without a
    # persist the whole shingle chain executes twice. The signature table
    # is tiny (id + k longs per doc) — at cluster scale this is the relation
    # you'd checkpoint to a table before the candidate join anyway.
    # (explode already drops docs with zero grams, matching the old
    # sig-is-null filter.)
    sig = _track_persist(minhash_signatures(grams, num_hashes, seed))

    # The band self-join moves only (id, band, bh) triples — the 32-long
    # signature arrays stay OUT of the bands×docs shuffle and are joined
    # back onto the (small) deduped pair set afterwards. At b bands this
    # cuts the join shuffle payload from b × |sig| to 2 × |sig| per doc.
    banded = _banded_keys(sig, bands, rows_per_band)

    pairs = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bh"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.size(
        F.filter(
            F.zip_with(F.col("sa"), F.col("sb"), lambda x, y: x == y),
            lambda eq: eq,
        )
    ) / F.lit(float(num_hashes))
    return (
        pairs.join(sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sa")), "id_a")
        .join(sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sb")), "id_b")
        .select("id_a", "id_b", est.cast("double").alias("est_jaccard"))
    )


def minhash_cross_candidates(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
    gram_hash: Callable[[Column], Column] = F.xxhash64,
) -> DataFrame:
    """Fuzzy benchmark decontamination: MinHash+LSH candidates BETWEEN a
    training corpus and a benchmark relation (the near-dup counterpart to
    the exact-n-gram ops token_subseq_find_multi and the Bloom bitset —
    catches paraphrased/truncated test-set leakage those miss). Both inputs
    need (id_col, text_col); returns (corpus_id, bench_id, est_jaccard)
    for every pair sharing at least one signature band.

    Scale shape: the benchmark side is small by definition (test sets are
    thousands of rows against a 10^12-row corpus), so its banded keys and
    signatures BROADCAST — the band probe and the bench-signature lookup
    are broadcast hash joins. The corpus side pays two (id × k longs)
    exchanges — the signature groupBy's map-side-combined shuffle and the
    candidate join-back onto the signature relation (AQE turns the latter
    into a broadcast when the candidate set is small, the common case) —
    and the text never shuffles. Same signature/banding kernels as the
    self-join dedup path (minhash_signatures/_banded_keys), so the
    estimate is bit-identical to what dedup would report for the pair."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rpb = num_hashes // bands
    sig_c = _track_persist(minhash_signatures(
        _gram_hashes(corpus, text_col, id_col, n, gram_hash), num_hashes, seed
    ))
    sig_b = _track_persist(minhash_signatures(
        _gram_hashes(bench, text_col, id_col, n, gram_hash), num_hashes, seed
    ))
    banded_c = _banded_keys(sig_c, bands, rpb)
    banded_b = _banded_keys(sig_b, bands, rpb)
    pairs = (
        banded_c.alias("a")
        .join(F.broadcast(banded_b.alias("b")), ["band", "bh"])
        .select(
            F.col("a.id").alias("corpus_id"), F.col("b.id").alias("bench_id")
        )
        .dropDuplicates(["corpus_id", "bench_id"])
    )
    est = F.size(
        F.filter(
            F.zip_with(F.col("sa"), F.col("sb"), lambda x, y: x == y),
            lambda eq: eq,
        )
    ) / F.lit(float(num_hashes))
    return (
        pairs.join(
            sig_c.select(F.col("id").alias("corpus_id"), F.col("sig").alias("sa")),
            "corpus_id",
        )
        .join(
            F.broadcast(
                sig_b.select(F.col("id").alias("bench_id"), F.col("sig").alias("sb"))
            ),
            "bench_id",
        )
        .select("corpus_id", "bench_id", est.cast("double").alias("est_jaccard"))
    )


def simhash_from_hashes(hashes_col: str = "gram_hashes"):
    """Vectorized SimHash fold: numpy over Arrow batches. Input column is the
    array<long> of per-gram xxhash64 values (computed JVM-side); output is
    the 64-bit signature. The bit-unpack + sign-accumulate is pure numpy —
    no per-row Python."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def fold(hs: pd.Series) -> pd.Series:
        # Whole-batch formulation (flatten + reduceat, like the JVM-side
        # minhash_signatures but for the 64-bit simhash bit matrix):
        # flatten every row's gram hashes, unpack to an (N, 64) bit matrix,
        # np.add.reduceat per row segment, then sign-compare + pack. One
        # numpy pipeline per Arrow batch — no per-row Python loop.
        lengths = hs.map(lambda v: 0 if v is None else len(v)).to_numpy(dtype=np.int64)
        out = np.zeros(len(hs), dtype=np.int64)
        if lengths.sum() == 0:
            return pd.Series(out)
        flat = np.concatenate(
            [np.asarray(v, dtype=np.int64) for v in hs if v is not None and len(v)]
        ).view(np.uint64)
        shifts = np.arange(64, dtype=np.uint64)
        # uint8 keeps the (N, 64) matrix at 64 B/gram; reduceat accumulates
        # into int64 so segments longer than 255 grams don't wrap
        bits = ((flat[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
        starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])[lengths > 0]
        sums = np.add.reduceat(bits, starts.astype(np.int64), axis=0, dtype=np.int64)
        nz = lengths[lengths > 0]
        sig = (sums * 2 > nz[:, None]).astype(np.uint64)
        packed = (sig << shifts).sum(axis=1).astype(np.uint64).view(np.int64)
        out[lengths > 0] = packed
        return pd.Series(out)

    return fold(hashes_col)


def simhash_signatures(grams: DataFrame, hashes_col: str = "gram_hashes") -> DataFrame:
    """(id, sig:long) SimHash signatures, computed entirely JVM-side: explode
    the gram hashes and take a per-bit majority vote as 64 sum-aggregates
    (map-side combine; no Python workers). Bit k of the signature is 1 iff
    strictly more than half the grams have bit k set — identical to the
    numpy fold in ``simhash_from_hashes``, including sig=0 for docs with no
    grams (restored by the left join on bare ids)."""
    exploded = grams.select("id", F.explode(hashes_col).alias("h"))
    bits = [
        F.sum(F.shiftrightunsigned("h", k).bitwiseAND(F.lit(1))).alias(f"_b{k}")
        for k in range(64)
    ]
    agg = exploded.groupBy("id").agg(F.count(F.lit(1)).alias("_n"), *bits)
    sig: Column | None = None
    for k in range(64):
        term = F.shiftleft((F.col(f"_b{k}") * 2 > F.col("_n")).cast("long"), k)
        sig = term if sig is None else sig.bitwiseOR(term)
    folded = agg.select("id", sig.alias("sig"))
    return grams.select("id").join(folded, "id", "left").select(
        "id", F.coalesce("sig", F.lit(0).cast("long")).alias("sig")
    )


def simhash64(col: Column, n: int = 2) -> Column:
    """Gram hashes JVM-side; bit fold via the Arrow UDF above (used through
    simhash_near_dups, which materializes the gram-hash column first)."""
    raise NotImplementedError("use simhash_near_dups / simhash_from_hashes")


def simhash_near_dups(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 2,
    max_hamming: int = 3,
    prefix_bits: int = 16,
    gram_hash: Callable[[Column], Column] = F.xxhash64,
    n_rotations: int = 1,
) -> DataFrame:
    """SimHash near-dup pairs: bucket on a ``prefix_bits``-wide block of the
    signature (LSH), compare within buckets by Hamming distance.

    ``n_rotations`` banding blocks are probed (block r covers bits
    ``[64-(r+1)*prefix_bits, 64-r*prefix_bits)``; candidates are the union
    over blocks, deduped on the pair). Pigeonhole guarantee: with
    ``n_rotations >= max_hamming + 1`` and ``n_rotations * prefix_bits == 64``
    every pair within ``max_hamming`` collides in at least one block —
    recall 1.0 (e.g. the defaults max_hamming=3 with n_rotations=4 x 16
    bits). One rotation keeps the single-bucket behavior. The union is one
    equi-join on (rotation, block) — never all-pairs — so cost grows
    linearly in rotations, not quadratically in rows. No upfront
    repartition: the signature groupBy's map-side combine shuffles per-doc
    bit-count rows, never the text."""
    if n_rotations < 1 or n_rotations * prefix_bits > 64:
        raise ValueError("need 1 <= n_rotations and n_rotations*prefix_bits <= 64")
    if gram_hash is F.xxhash64:
        gh = hashed_shingles(F.col(text_col), n)  # string-free fast path
    else:
        gh = F.transform(shingles(F.col(text_col), n), lambda g: gram_hash(g))
    grams = df.select(F.col(id_col).alias("id"), gh.alias("gram_hashes"))
    # persisted for the same two-sided self-join reason as the MinHash path
    sig = _track_persist(simhash_signatures(grams, "gram_hashes"))
    mask = (1 << prefix_bits) - 1
    blocks = F.array(
        *[
            F.shiftrightunsigned("sig", 64 - (r + 1) * prefix_bits)
            .bitwiseAND(F.lit(mask))
            for r in range(n_rotations)
        ]
    )
    bucketed = sig.select("id", "sig", F.posexplode(blocks).alias("rot", "bucket"))
    pairs = (
        bucketed.alias("a")
        .join(bucketed.alias("b"), ["rot", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    if n_rotations > 1:
        pairs = pairs.dropDuplicates(["id_a", "id_b"])
    return pairs


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components over near-dup pairs → ``(id, cluster_id)`` with
    ``cluster_id = min(id)`` in the component. The missing last step of a
    dedup pipeline: pair finders (MinHash/SimHash/embedding LSH) emit edges;
    clustering turns them into keep/drop decisions that are CONSISTENT
    across transitive chains (a~b, b~c must collapse to one keeper even when
    (a,c) was never a candidate pair).

    Algorithm: min-label propagation. Labels start as the id; each round
    every node takes the min of its own and its neighbors' labels; stop when
    a round changes nothing. Each round is one shuffle (edge-label join +
    groupBy min); rounds needed = component diameter, which for near-dup
    graphs is tiny (dup sets are near-cliques — 2-3 rounds in practice, the
    reason plain propagation beats the alternating-star constructions here).
    The edge list is persisted across rounds; each round's labels are
    localCheckpoint'ed — iterative joins otherwise nest the previous round's
    plan twice per round and the logical tree grows 2^rounds (a driver OOM
    long before any data is big; on a multi-node cluster use a reliable
    checkpoint dir instead of localCheckpoint for executor-loss tolerance).
    Driver work is O(iterations) counts, never row data."""
    edges = _track_persist(
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds"
        )
    return labels.select("id", F.col("label").alias("cluster_id"))


def dedup_keepers(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Per-document keep/drop decision from a near-dup pair list: every doc
    gets its transitive ``cluster_id`` (docs in no pair are their own
    singleton cluster) and ``is_keeper`` = (id == min id of the cluster).
    Downstream filters ``is_keeper`` to materialize the deduped corpus.
    The component relation is tiny (only docs that appear in some pair), so
    the join back to the corpus is a broadcast in practice; the corpus
    itself is never shuffled."""
    comp = connected_components(pairs, id_a=id_a, id_b=id_b)
    return (
        df.join(comp, df[id_col] == comp.id, "left")
        .select(
            df[id_col],
            F.coalesce(F.col("cluster_id"), df[id_col]).alias("cluster_id"),
        )
        .withColumn("is_keeper", F.col(id_col) == F.col("cluster_id"))
    )
