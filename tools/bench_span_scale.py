"""Scale rehearsal for the span-level curation ops (round-5 additions).

Runs c4_span_dedup (3-word spans over synthesized documents),
token_substring_dedup (w=4 windows over synthesized token arrays), and the
composed curation_funnel_v2 (line correction -> gates -> span dedup ->
rollup over the same documents) at two scales (default 2M and 20M rows)
and records wall time plus shuffle read/write bytes, proving the
linear-exchange claims at a scale where a hidden quadratic (or a hot-span
blowup) would show.

Inputs reuse the funnel generator's corpus shape: 20% of doc_ids duplicate
the text/tokens of the preceding multiple-of-10 id, so the first-occurrence
rules have real cross-doc work at every scale.

Usage: python tools/bench_span_scale.py [rows ...]   (default: 2000000 20000000)
Writes .bench_state/span_scale.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_funnel_scale import make_documents, shuffle_totals  # noqa: E402


def make_token_docs(spark, n_rows: int, path: str) -> None:
    from pyspark.sql import functions as F

    if os.path.isdir(path):
        return
    df = spark.range(n_rows, numPartitions=max(32, n_rows // 250_000)).select(
        F.col("id").alias("doc_id")
    )
    # 20% of doc_ids share the token seed of the preceding multiple-of-10 id
    seed = F.when(
        F.col("doc_id") % 10 < 2, F.col("doc_id") - F.col("doc_id") % 10
    ).otherwise(F.col("doc_id"))
    n_tok = 24 + F.pmod(F.xxhash64(seed), F.lit(41))
    tokens = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda i: F.pmod(F.xxhash64(seed * 131 + i), F.lit(50_000)).cast("int"),
    )
    df.select(
        F.col("doc_id").cast("string").alias("doc_id"), tokens.alias("tokens")
    ).write.mode("overwrite").parquet(path)


def main() -> None:
    scales = [int(x) for x in sys.argv[1:]] or [2_000_000, 20_000_000]
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 8)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    from pyspark.sql import functions as F

    from loongcollector_spark.functions import text as tx
    from loongcollector_spark.operators.token_ops import token_substring_dedup
    from loongcollector_spark.session import get_spark

    spark = get_spark(
        app_name="span-scale",
        master=f"local[{cpus}]",
        shuffle_partitions=str(int(cpus) * 4),
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    ui_url = spark.sparkContext.uiWebUrl
    if not ui_url:
        raise RuntimeError("Spark UI is not running — shuffle evidence unavailable")

    def c4_runner(spark, sf_dir):
        from loongcollector_spark.queries import _chunked_docs

        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        return tx.c4_span_dedup(_chunked_docs(docs, 3), "text", "doc_id")

    def substr_runner(spark, sf_dir):
        toks = spark.read.parquet(os.path.join(sf_dir, "tokens.parquet"))
        return token_substring_dedup(toks, w=4)

    def funnel_runner(spark, sf_dir):
        # the registered composed funnel reads {sf_dir}/documents.parquet
        # via load_table — the synthesized corpus satisfies that contract
        from loongcollector_spark.queries import QUERIES

        return QUERIES["curation_funnel_v2"].spark(spark, sf_dir)

    out: dict = {
        "cpus": int(cpus),
        "load_avg_start": round(os.getloadavg()[0], 2),
        "scales": {},
    }
    for n in scales:
        sf_dir = f"/tmp/lc_span_{n}"
        make_documents(spark, n, os.path.join(sf_dir, "documents.parquet"))
        make_token_docs(spark, n, os.path.join(sf_dir, "tokens.parquet"))
        per_q = {}
        from loongcollector_spark.functions import dedup

        for name, fn in (
            ("c4_span_dedup", c4_runner),
            ("token_substring_dedup", substr_runner),
            ("curation_funnel_v2", funnel_runner),
        ):
            r0, w0 = shuffle_totals(ui_url, app_id)
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = round(time.time() - t0, 1)
            dedup.release_persisted()
            r1, w1 = shuffle_totals(ui_url, app_id)
            per_q[name] = {
                "wall_sec": wall,
                "rows_per_sec": round(n / wall, 1),
                "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
                "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
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
                    / max(out["scales"][lo][q]["wall_sec"], 0.1), 2
                ),
                "shuffle_write_x": round(
                    out["scales"][hi][q]["shuffle_write_mb"]
                    / max(out["scales"][lo][q]["shuffle_write_mb"], 0.1), 2
                ),
                "scale_x": scales[1] / scales[0],
            }
            for q in out["scales"][hi]
        }
    os.makedirs(".bench_state", exist_ok=True)
    with open(".bench_state/span_scale.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
