"""Boilerplate-skew evidence for the dedup df-cut (VERDICT r2 item 9).

Fixture: N docs that ALL share one boilerplate phrase (so its shingles have
document frequency == N) plus a unique tail per doc. Without a
document-frequency cut, the inverted-index self-join emits O(N²) candidate
pairs from the hot shingles alone; with ``max_shingle_df`` those shingles
drop out of the index and the candidate set stays bounded by the genuinely
rare shingles.

Sweeps max_shingle_df over (None, 1024, 256, 64) for ngram_jaccard_pairs and
reports candidate-pair counts + wall time, plus the MinHash+LSH banding
candidate count on the same fixture (banding requires a whole band's worth
of signature positions to agree, so shared boilerplate inflates candidates
only in proportion to its weight in the signature — two orders of magnitude
below the inverted index's O(N²) hot-shingle blowup on this fixture).

Prints one JSON line. Run: python tools/bench_dedup_skew.py [n_docs]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    from pyspark.sql import functions as F

    from loongcollector_spark.functions import dedup
    from loongcollector_spark.session import get_spark

    spark = get_spark(master="local[16]", shuffle_partitions="32")
    spark.sparkContext.setLogLevel("ERROR")

    # every doc: the same 5-word boilerplate head (3 hot 3-gram shingles,
    # df = n_docs) + 6 unique tail words (rare shingles)
    hot = "subscribe to our daily newsletter"
    df = (
        spark.range(n_docs)
        .select(
            F.col("id"),
            F.concat(
                F.lit(hot + " "),
                F.concat_ws(
                    " ",
                    *[
                        F.concat(F.lit(f"w{j}_"), F.col("id").cast("string"))
                        for j in range(6)
                    ],
                ),
            ).alias("text"),
        )
        .persist()
    )
    df.count()

    results: dict = {"n_docs": n_docs, "hot_shingle_df": n_docs, "ngram": []}
    for cut in (None, 1024, 256, 64):
        t0 = time.time()
        n_pairs = dedup.ngram_jaccard_pairs(
            df, "text", "id", n=3, threshold=0.0, max_shingle_df=cut
        ).count()
        dedup.release_persisted()
        results["ngram"].append(
            {
                "max_shingle_df": cut,
                "candidate_pairs": n_pairs,
                "sec": round(time.time() - t0, 2),
            }
        )

    t0 = time.time()
    mh = dedup.minhash_lsh_candidates(df, "text", "id").count()
    dedup.release_persisted()
    results["minhash_banding"] = {"candidate_pairs": mh, "sec": round(time.time() - t0, 2)}

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
