"""Scale rehearsal for sequence packing: concat-and-chunk vs Best-Fit-
Decreasing (Ding et al. 2024) at two scales (default 2M and 20M docs).

Input is a MATERIALIZED parquet table (doc_id, n_tok, shard) — the north
rule's columnar pre-tokenized shape; packing needs only lengths, so tokens
stay columnar-pruned out of the scan entirely. The shard key is
pmod(xxhash64(doc_id), S) with S grown proportionally to rows
(S = max(64, rows // 8192)) — THE scale knob: per-shard piece count stays
~8k at any corpus size, so the per-shard sequential BFD fold is
constant-cost and the job's wall scales with rows/cores like any other
embarrassingly-sharded stage. What must stay linear at 10x rows:

- both kernels' only exchange is the hash shuffle of (doc, piece) rows on
  the shard key (pack_chunks additionally sorts within partitions);
- BFD's inner numpy mask/argmin is O(pieces x bins) per shard, bounded by
  the constant shard size — no global state, no driver round-trips.

Each headline (``wall_sec``) is the MIN of N warm runs
(N = ``LC_BENCH_QUERY_RUNS``, default 3) after an unrecorded warm-up pass;
min-not-median for the documented additive-neighbor-noise reason
(see bench_bpe_scale.py). Every raw sample + load average is recorded.

Usage: python tools/bench_pack_scale.py [rows ...] (default: 2000000 20000000)
Writes .bench_state/pack_scale.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_funnel_scale import shuffle_totals  # noqa: E402


def main() -> None:
    scales = sorted(int(x) for x in sys.argv[1:]) or [2_000_000, 20_000_000]
    # sorted: linear_ratios assumes ascending scales; an inverted CLI
    # order would write ratios that misread as super-linear results
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 8)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    from pyspark.sql import functions as F

    from loongcollector_spark.operators.token_ops import (
        token_pack_bestfit,
        token_pack_chunks,
    )
    from loongcollector_spark.session import get_spark
    from loongcollector_spark.sources.synthetic import generate_sequences_head

    spark = get_spark(
        app_name="pack-scale",
        master=f"local[{cpus}]",
        shuffle_partitions=str(int(cpus) * 4),
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    ui_url = spark.sparkContext.uiWebUrl
    if not ui_url:
        raise RuntimeError("Spark UI is not running — shuffle evidence unavailable")

    def n_shards(n: int) -> int:
        return max(64, n // 8192)

    def make_lengths(n: int) -> str:
        """(doc_id, n_tok, shard) parquet — lengths only; the packers never
        touch token payloads, so the rehearsal input carries none."""
        path = f"/tmp/lc_packlen_{n}"
        if not os.path.isdir(path):
            seqs = generate_sequences_head(
                spark, n, head=1, partitions=int(cpus) * 4
            )
            seqs.select(
                "doc_id",
                "n_tok",
                F.pmod(F.xxhash64("doc_id"), F.lit(n_shards(n)))
                .cast("string")
                .alias("shard"),
            ).write.mode("overwrite").parquet(path)
        return path

    def lengths_df(n):
        return spark.read.parquet(make_lengths(n))

    runners = {
        "pack_chunks": lambda n: token_pack_chunks(
            lengths_df(n), chunk_len=2048, partition_by="shard"
        ),
        "pack_bestfit": lambda n: token_pack_bestfit(
            lengths_df(n), capacity=2048, shard_col="shard"
        ),
    }

    n_runs = int(os.environ.get("LC_BENCH_QUERY_RUNS") or 3)
    out: dict = {
        "cpus": int(cpus),
        "capacity": 2048,
        "docs_per_shard_target": 8192,
        "n_runs": n_runs,
        "load_avg_start": round(os.getloadavg()[0], 2),
        "scales": {},
    }
    warm = spark.read.parquet(make_lengths(200_000)).limit(100_000)
    for fn in (
        lambda: token_pack_chunks(warm, chunk_len=2048, partition_by="shard"),
        lambda: token_pack_bestfit(warm, capacity=2048, shard_col="shard"),
    ):
        fn().write.format("noop").mode("overwrite").save()

    for n in scales:
        make_lengths(n)
        per_q = {}
        for name, fn in runners.items():
            r0, w0 = shuffle_totals(ui_url, app_id)
            runs = []
            for _ in range(n_runs):
                t0 = time.time()
                fn(n).write.format("noop").mode("overwrite").save()
                runs.append(round(time.time() - t0, 1))
            wall = min(runs)
            r1, w1 = shuffle_totals(ui_url, app_id)
            per_q[name] = {
                "wall_sec": wall,
                "runs": runs,
                "median": statistics.median(runs),
                "rows_per_sec": round(n / wall, 1),
                "n_shards": n_shards(n),
                "shuffle_read_mb": round((r1 - r0) / 1e6 / n_runs, 1),
                "shuffle_write_mb": round((w1 - w0) / 1e6 / n_runs, 1),
                "load_avg": round(os.getloadavg()[0], 2),
            }
            print(f"[{n}] {name}: {per_q[name]}", flush=True)
        out["scales"][str(n)] = per_q

    if len(scales) == 2:
        lo, hi = (str(s) for s in scales)
        out["linear_ratios"] = {
            q: {
                "wall_x": round(
                    out["scales"][hi][q]["wall_sec"]
                    / max(out["scales"][lo][q]["wall_sec"], 0.1),
                    2,
                ),
                "shuffle_write_x": round(
                    out["scales"][hi][q]["shuffle_write_mb"]
                    / max(out["scales"][lo][q]["shuffle_write_mb"], 0.1),
                    2,
                ),
                "scale_x": scales[1] / scales[0],
            }
            for q in out["scales"][lo]
        }

    os.makedirs(".bench_state", exist_ok=True)
    with open(".bench_state/pack_scale.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
