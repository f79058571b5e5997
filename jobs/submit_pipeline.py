"""spark-submit entry point for a collector pipeline run.

Packaged per the north rule for ``spark-submit --py-files``:

    python tools/make_package.py          # builds dist/loongcollector_spark.zip
    spark-submit --master <cluster> \\
        --py-files dist/loongcollector_spark.zip \\
        jobs/submit_pipeline.py \\
        --config pipeline.json --input /path/to/sequences \\
        --output /path/to/sinks --run-id run-2026-08-16 [--resume]

The job reads the tokenized-sequence table (parquet/Iceberg path), runs the
configured parse → enrich → route → aggregate pipeline, writes every sink +
the metrics rollup, and (with --resume) skips buckets committed by a prior
run via the per-partition lineage manifests.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True, help="pipeline spec JSON/YAML")
    ap.add_argument("--input", required=True, help="input table path (parquet dir)")
    ap.add_argument("--output", required=True, help="base path for per-sink tables")
    ap.add_argument("--run-id", default="run", help="lineage run id")
    ap.add_argument("--resume", action="store_true",
                    help="checkpoint-resume: skip buckets with committed manifests")
    ap.add_argument("--render-lines", action="store_true",
                    help="attach detokenized log lines before the processor chain "
                         "(synthetic-input pipelines)")
    ap.add_argument("--input-format", default="parquet")
    ap.add_argument("--streaming", action="store_true",
                    help="run as a Structured Streaming query (file source, "
                         "foreachBatch fan-out); requires --schema")
    ap.add_argument("--schema", default=None,
                    help="input schema DDL for --streaming (file stream sources "
                         "cannot infer)")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="streaming checkpointLocation (offset resume)")
    ap.add_argument("--continuous", action="store_true",
                    help="with --streaming: keep tailing instead of drain-and-stop")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from loongcollector_spark.config import load_spec
    from loongcollector_spark.metrics import MetricsRegistry
    from loongcollector_spark.pipeline import run_pipeline

    # spark-submit provides master/conf; builder only names the app.
    spark = SparkSession.builder.appName("loongcollector-pipeline").getOrCreate()

    spec = load_spec(args.config)

    if args.streaming:
        if not args.schema or not args.checkpoint_dir:
            ap.error("--streaming requires --schema and --checkpoint-dir")
        from loongcollector_spark.streaming import run_streaming_pipeline

        res = run_streaming_pipeline(
            spark,
            args.input,
            args.schema,
            spec,
            args.output,
            args.checkpoint_dir,
            input_format=args.input_format,
            available_now=not args.continuous,
        )
        print(json.dumps(res, default=str))
        return 0

    df = spark.read.format(args.input_format).load(args.input)
    if args.render_lines:
        from loongcollector_spark.sources import render_lines

        df = render_lines(df)

    metrics = MetricsRegistry()
    result = run_pipeline(
        df,
        spec,
        output_base=args.output,
        metrics=metrics,
        checkpoint=args.resume,
        run_id=args.run_id,
    )
    print(json.dumps(result, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
