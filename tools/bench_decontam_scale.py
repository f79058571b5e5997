"""Scale rehearsal for cross-corpus fuzzy decontamination
(minhash_cross_candidates) at two corpus scales (default 2M and 20M docs)
against a FIXED 10k-doc benchmark.

What must hold at 10x corpus rows:

- the benchmark side is constant: its signatures and band keys broadcast,
  so the band probe and bench-signature lookup cost no corpus shuffle;
- the corpus-side exchanges carry ONLY (id x 32 longs) signature rows —
  the signature groupBy (map-side combined) plus the candidate join-back —
  so shuffle bytes scale linearly with docs and NEVER include text;
- candidate count scales with true overlap (the benchmark is the 240-char
  prefix of a fixed absolute slice of doc ids), not with corpus size.

Production path (xxhash64 gram hash). MIN of N warm runs
(N = LC_BENCH_QUERY_RUNS, default 3) after an unrecorded warm-up — same
additive-neighbor-noise protocol as every record in BENCH.md; raw samples
and load averages recorded alongside.

Usage: python tools/bench_decontam_scale.py [rows ...] (default: 2M 20M)
Writes .bench_state/decontam_scale.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_funnel_scale import make_documents, shuffle_totals  # noqa: E402

BENCH_DOCS = 10_000


def main() -> None:
    scales = sorted(int(x) for x in sys.argv[1:]) or [2_000_000, 20_000_000]
    # sorted: linear_ratios assumes ascending scales; an inverted CLI
    # order would write ratios that misread as super-linear results
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 8)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    from pyspark.sql import functions as F

    from loongcollector_spark.functions import dedup
    from loongcollector_spark.session import get_spark

    spark = get_spark(
        app_name="decontam-scale",
        master=f"local[{cpus}]",
        shuffle_partitions=str(int(cpus) * 4),
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    ui_url = spark.sparkContext.uiWebUrl
    if not ui_url:
        raise RuntimeError("Spark UI is not running — shuffle evidence unavailable")

    def docs_df(n):
        path = f"/tmp/lc_funnel_{n}"
        make_documents(spark, n, os.path.join(path, "documents.parquet"))
        return spark.read.parquet(os.path.join(path, "documents.parquet"))

    def bench_df(n):
        # fixed ABSOLUTE id slice: the same BENCH_DOCS rows regardless of
        # corpus size, so the bench side is scale-invariant by construction
        return (
            docs_df(n)
            .filter(F.col("doc_id") < BENCH_DOCS)
            .select("doc_id", F.substring("text", 1, 240).alias("text"))
        )

    def run(n):
        return dedup.minhash_cross_candidates(
            docs_df(n), bench_df(n), "text", "doc_id",
            n=3, num_hashes=32, bands=8,
        )

    n_runs = int(os.environ.get("LC_BENCH_QUERY_RUNS") or 3)
    out: dict = {
        "cpus": int(cpus),
        "bench_docs": BENCH_DOCS,
        "n_runs": n_runs,
        "load_avg_start": round(os.getloadavg()[0], 2),
        "scales": {},
    }
    # warm-up (JVM codegen + Arrow worker spin-up), unrecorded
    warm = dedup.minhash_cross_candidates(
        docs_df(200_000).limit(100_000), bench_df(200_000).limit(1_000),
        "text", "doc_id",
    )
    warm.write.format("noop").mode("overwrite").save()
    dedup.release_persisted()

    for n in scales:
        docs_df(n)  # materialize outside the timed region
        r0, w0 = shuffle_totals(ui_url, app_id)
        runs, pairs = [], None
        for _ in range(n_runs):
            t0 = time.time()
            pairs = run(n).count()
            runs.append(round(time.time() - t0, 1))
            dedup.release_persisted()
        wall = min(runs)
        r1, w1 = shuffle_totals(ui_url, app_id)
        out["scales"][str(n)] = {
            "wall_sec": wall,
            "runs": runs,
            "median": statistics.median(runs),
            "docs_per_sec": round(n / wall, 1),
            "candidate_pairs": pairs,
            "shuffle_read_mb": round((r1 - r0) / 1e6 / n_runs, 1),
            "shuffle_write_mb": round((w1 - w0) / 1e6 / n_runs, 1),
            "load_avg": round(os.getloadavg()[0], 2),
        }
        print(f"[{n}] {out['scales'][str(n)]}", flush=True)

    if len(scales) == 2:
        lo, hi = (str(s) for s in scales)
        out["linear_ratios"] = {
            "wall_x": round(
                out["scales"][hi]["wall_sec"]
                / max(out["scales"][lo]["wall_sec"], 0.1), 2,
            ),
            "shuffle_write_x": round(
                out["scales"][hi]["shuffle_write_mb"]
                / max(out["scales"][lo]["shuffle_write_mb"], 0.1), 2,
            ),
            "scale_x": scales[1] / scales[0],
        }

    os.makedirs(".bench_state", exist_ok=True)
    with open(".bench_state/decontam_scale.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
