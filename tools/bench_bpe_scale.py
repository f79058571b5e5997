"""Scale rehearsal for the BPE tokenizer-training primitives + UniMax.

Runs token_pair_counts, token_bpe_merge (the two corpus-wide rewrite/count
kernels) over a MATERIALIZED parquet token table — the north rule's input
shape is "an Iceberg table of pre-tokenized training sequences", so the
timed region reads columnar storage, not an in-flight Python generator —
and unimax_resample over the synthesized documents corpus, at two scales
(default 2M and 20M rows), recording wall time plus shuffle read/write
bytes — proving at 10x apart:

- pair counting exchanges ONLY the map-side-combined (a, b) partials — the
  key space is |alphabet|^2, so shuffle bytes stay bounded (per-task partial
  count grows with task count, not with rows-per-task);
- the merge kernel exchanges NOTHING (scan -> Arrow rewrite -> noop write,
  zero Exchange in the plan);
- unimax's only exchange is the bounded per-language aggregate; the gate is
  a scan-side filter behind a broadcast rate table.

Token payload per row is head=32 tokens reduced to a 256-symbol alphabet
(the byte-level BPE shape); 20M rows = 640M tokens through the kernels.
Each headline (``wall_sec``) is the MIN of N warm runs (N =
``LC_BENCH_QUERY_RUNS``, default 3; the committed record used 5) after an
unrecorded warm-up pass (JVM codegen
+ 32 Arrow worker spin-ups); every raw sample, the median, and the 1-min
load average are recorded alongside. Min-not-median because the noise on
this host is strictly additive neighbor load: a fresh-JVM probe showed
identical pair-count jobs swinging 4.7s..37.6s at 20M rows across JVMs
(GC/host noise), so single samples here are not measurements.

Usage: python tools/bench_bpe_scale.py [rows ...]  (default: 2000000 20000000)
Writes .bench_state/bpe_scale.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_funnel_scale import make_documents, shuffle_totals  # noqa: E402


def main() -> None:
    scales = [int(x) for x in sys.argv[1:]] or [2_000_000, 20_000_000]
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 8)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    from pyspark.sql import functions as F

    from loongcollector_spark.functions.sampling import unimax_resample
    from loongcollector_spark.operators.token_ops import (
        token_bpe_merge,
        token_pair_counts,
    )
    from loongcollector_spark.session import get_spark
    from loongcollector_spark.sources.synthetic import generate_sequences_head

    spark = get_spark(
        app_name="bpe-scale",
        master=f"local[{cpus}]",
        shuffle_partitions=str(int(cpus) * 4),
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.sql.mapKeyDedupPolicy": "LAST_WIN",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    ui_url = spark.sparkContext.uiWebUrl
    if not ui_url:
        raise RuntimeError("Spark UI is not running — shuffle evidence unavailable")

    def make_tokens(n: int) -> str:
        """Materialize the pre-tokenized table once (cached across runs):
        F1 head-32 sequences reduced to a 256-symbol alphabet, written as
        parquet so the timed kernels read columnar storage."""
        path = f"/tmp/lc_bpetoks_{n}"
        if not os.path.isdir(path):
            seqs = generate_sequences_head(spark, n, head=32, partitions=int(cpus) * 4)
            seqs.select(
                "doc_id",
                F.transform("tokens", lambda x: (x % 256).cast("int")).alias("t"),
            ).write.mode("overwrite").parquet(path)
        return path

    def tokens_df(n):
        return spark.read.parquet(make_tokens(n))

    def train2(n):
        # the composed iterative loop: 2 full count-pick-rewrite rounds with
        # the cluster-durable parquet spill path truncating lineage, so the
        # measurement includes the materialization an executor-loss-safe
        # deployment pays (localCheckpoint would hide it in storage memory)
        from loongcollector_spark.operators.token_ops import bpe_train

        _, final = bpe_train(
            tokens_df(n), 2, tokens_col="t", start_id=256,
            spill_dir=f"/tmp/lc_bpetrain_spill_{n}",
        )
        return final

    runners = {
        "token_pair_counts": lambda n, sf: token_pair_counts(
            tokens_df(n), tokens_col="t", top_k=64
        ),
        "token_bpe_merge": lambda n, sf: token_bpe_merge(
            tokens_df(n), (7, 13), 256, tokens_col="t"
        ),
        "bpe_train_2rounds": lambda n, sf: train2(n),
        "unimax_resample": lambda n, sf: unimax_resample(
            spark.read.parquet(os.path.join(sf, "documents.parquet")),
            "lang", "doc_id", "n_chars",
            budget=n * 100, max_epochs=3,
        ),
    }

    n_runs = int(os.environ.get("LC_BENCH_QUERY_RUNS") or 3)
    out: dict = {
        "cpus": int(cpus),
        "head_tokens": 32,
        "n_runs": n_runs,
        "load_avg_start": round(os.getloadavg()[0], 2),
        "scales": {},
    }
    # Unrecorded warm-up: the first pass through each path pays JVM codegen
    # + Python-worker spin-up (32 Arrow workers); without it the small-scale
    # wall time is startup-dominated and the 10x wall ratio reads ~1x.
    warm_sf = f"/tmp/lc_funnel_{scales[0]}"
    make_documents(spark, scales[0], os.path.join(warm_sf, "documents.parquet"))
    warm_toks = spark.read.parquet(make_tokens(200_000))
    token_pair_counts(warm_toks, tokens_col="t", top_k=64).write.format(
        "noop"
    ).mode("overwrite").save()
    token_bpe_merge(warm_toks, (7, 13), 256, tokens_col="t").write.format(
        "noop"
    ).mode("overwrite").save()
    unimax_resample(
        spark.read.parquet(os.path.join(warm_sf, "documents.parquet")),
        "lang", "doc_id", "n_chars", budget=10_000_000, max_epochs=3,
    ).write.format("noop").mode("overwrite").save()
    from loongcollector_spark.operators.token_ops import bpe_train

    bpe_train(
        warm_toks, 1, tokens_col="t", start_id=256,
        spill_dir="/tmp/lc_bpetrain_spill_warm",
    )[1].write.format("noop").mode("overwrite").save()

    for n in scales:
        sf_dir = f"/tmp/lc_funnel_{n}"
        make_documents(spark, n, os.path.join(sf_dir, "documents.parquet"))
        make_tokens(n)
        per_q = {}
        for name, fn in runners.items():
            r0, w0 = shuffle_totals(ui_url, app_id)
            runs = []
            for _ in range(n_runs):
                t0 = time.time()
                fn(n, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(round(time.time() - t0, 1))
            # min-of-N, not median: run-to-run swings of 10x on identical
            # jobs were measured on this host (external neighbor load the
            # sandbox can't see) — the minimum approximates true compute
            # cost under additive noise; every raw run is recorded.
            wall = min(runs)
            r1, w1 = shuffle_totals(ui_url, app_id)
            per_q[name] = {
                "wall_sec": wall,
                "runs": runs,
                "median": statistics.median(runs),
                "rows_per_sec": round(n / wall, 1),
                # totals span all n_runs executions of this kernel
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
    with open(".bench_state/bpe_scale.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
