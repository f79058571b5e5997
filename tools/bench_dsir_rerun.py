"""One-query re-run of the funnel scale rehearsal for dsir_importance_weights
after the map-side scoring rewrite (bucket-histogram-only shuffle; per-doc
F.aggregate fold against a broadcast bucket→log-ratio map).

Reuses bench_funnel_scale's synthesized /tmp/lc_funnel_{n} documents and its
Spark-UI shuffle instrumentation so the before/after rows are comparable.

Usage: python tools/bench_dsir_rerun.py [rows ...]   (default: 2000000 20000000)
Prints one JSON line; merges the result into .bench_state/funnel_scale.json
under the key "dsir_importance_weights_mapside".
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from bench_funnel_scale import make_documents, shuffle_totals  # noqa: E402


def main() -> None:
    scales = [int(x) for x in sys.argv[1:]] or [2_000_000, 20_000_000]
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 8)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    from loongcollector_spark.functions import dedup
    from loongcollector_spark.queries import QUERIES as REGISTRY
    from loongcollector_spark.session import get_spark

    spark = get_spark(
        app_name="dsir-rerun",
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

    fn = REGISTRY["dsir_importance_weights"].spark
    out: dict = {}
    for n in scales:
        sf_dir = f"/tmp/lc_funnel_{n}"
        make_documents(spark, n, os.path.join(sf_dir, "documents.parquet"))
        r0, w0 = shuffle_totals(ui_url, app_id)
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = round(time.time() - t0, 1)
        dedup.release_persisted()
        r1, w1 = shuffle_totals(ui_url, app_id)
        out[str(n)] = {
            "wall_sec": wall,
            "rows_per_sec": round(n / wall, 1),
            "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
            "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
            "load_avg": round(os.getloadavg()[0], 2),
        }
        print(f"[{n}] dsir mapside: {out[str(n)]}", flush=True)

    state_path = ".bench_state/funnel_scale.json"
    if os.path.exists(state_path):
        with open(state_path) as f:
            state = json.load(f)
        for n, rec in out.items():
            state.setdefault("scales", {}).setdefault(n, {})[
                "dsir_importance_weights_mapside"
            ] = rec
        with open(state_path, "w") as f:
            json.dump(state, f, indent=1)
    print(json.dumps({"dsir_mapside": out}))


if __name__ == "__main__":
    main()
