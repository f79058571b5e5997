"""Skew evidence: why the rollups are salted / two-phase.

`source` is Zipfian (head source ~40% of rows by construction — FIXTURES F1).
For ALGEBRAIC aggregates (count/sum/min/max) Spark's partial aggregation
already neutralizes skew: the map side combines before the shuffle, so every
reducer receives one partial row per (source, map-partition). The interesting
case is a NON-decomposable aggregate — count-distinct — where the naive plan
ships every (source, doc_id) pair of the head source to a single reducer.

This tool times, on the same input:
  naive    groupBy(source).agg(countDistinct(doc_id))
  twophase groupBy(source, doc_id) [spreads by BOTH cols] -> groupBy(source).count()

and (for honesty) the algebraic rollup with and without salting, expecting
~no difference there. Appends a section to BENCH.md.

Usage: python tools/bench_skew.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timed(df) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

    from pyspark.sql import functions as F

    from loongcollector_spark.operators import aggregate as agg_ops
    from loongcollector_spark.session import get_spark
    from loongcollector_spark.sources import generate_sequences

    spark = get_spark(master="local[32]", shuffle_partitions="64")
    spark.sparkContext.setLogLevel("ERROR")

    path = f"/tmp/lc_bench_input_{n_rows}"
    if not os.path.isdir(path):
        generate_sequences(spark, n_rows, partitions=64).select(
            "doc_id", "n_tok", "source"
        ).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path).select("doc_id", "n_tok", "source")
    df.count()  # warm IO

    naive_cd = df.groupBy("source").agg(F.countDistinct("doc_id").alias("uniq"))
    twophase_cd = (
        df.groupBy("source", "doc_id").agg(F.count(F.lit(1)).alias("_"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("uniq"))
    )
    plain_sum = df.groupBy("source").agg(
        F.count(F.lit(1)).alias("rows"), F.sum("n_tok").alias("tokens")
    )
    salted_sum = agg_ops.salted_agg(
        df,
        ["source"],
        {"rows": ("count", F.lit(1)), "tokens": ("sum", F.col("n_tok").cast("long"))},
        salt_expr=F.xxhash64(F.col("doc_id")),
        salt_buckets=16,
    )

    res = {
        "n_rows": n_rows,
        "count_distinct_naive_sec": round(timed(naive_cd), 3),
        "count_distinct_twophase_sec": round(timed(twophase_cd), 3),
        "algebraic_plain_sec": round(timed(plain_sum), 3),
        "algebraic_salted_sec": round(timed(salted_sum), 3),
    }
    print(json.dumps(res))

    with open(os.path.join(REPO, "BENCH.md"), "a") as fh:
        fh.write(
            f"""
## Skew handling evidence ({n_rows:,} rows, head source ≈40% of input)

| aggregate | plan | best-of-2 (s) |
|---|---|---|
| count-distinct(doc_id) by source | naive single-reducer | {res['count_distinct_naive_sec']} |
| count-distinct(doc_id) by source | two-phase (spread by (source,doc_id) first) | {res['count_distinct_twophase_sec']} |
| rows+sum(tokens) by source | plain groupBy (map-side combine) | {res['algebraic_plain_sec']} |
| rows+sum(tokens) by source | salted two-phase | {res['algebraic_salted_sec']} |

Takeaway encoded in the engine: algebraic rollups rely on partial
aggregation (salting is a wash at this scale and becomes insurance at 10^12
when a single source's partials overflow one reducer's memory); genuinely
holistic aggregates route through the two-phase spread — `salted_agg` and
`sink_metrics` implement exactly that split.
"""
        )


if __name__ == "__main__":
    main()
