"""Hot-key evidence bench: exact window rate_limit vs the scale-safe
hash-slice form on a Zipf-skewed key (one key holds ~80% of rows — the shape
where a key-partitioned window serializes the stage on one task).

Prints one JSON line:
  {"rows": N, "window_sec": a, "sampled_sec": b, "speedup": a/b,
   "window_max_task_rows": ..., "sampled_max_task_rows": ...}

Run: python tools/bench_skew.py [n_rows]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    from pyspark.sql import functions as F

    from loongcollector_spark.operators.filters import rate_limit, rate_limit_sampled
    from loongcollector_spark.session import get_spark

    spark = get_spark(master="local[16]", shuffle_partitions="32")
    spark.sparkContext.setLogLevel("ERROR")

    # 80% of rows on one key, the rest uniform over 10k keys
    df = (
        spark.range(n)
        .withColumn(
            "k",
            F.when(F.col("id") % 5 < 4, F.lit("hot")).otherwise(
                F.concat(F.lit("k"), (F.col("id") % 10000).cast("string"))
            ),
        )
        .persist()
    )
    df.count()

    def timed(fn):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return best

    window_sec = timed(lambda: rate_limit(df, ["k"], 100, order_by=["id"]))
    sampled_sec = timed(lambda: rate_limit_sampled(df, ["k"], 100, F.col("id")))

    print(
        json.dumps(
            {
                "rows": n,
                "window_sec": round(window_sec, 3),
                "sampled_sec": round(sampled_sec, 3),
                "speedup": round(window_sec / sampled_sec, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
