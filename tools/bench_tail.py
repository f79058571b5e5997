"""log_tail source throughput at two parallelism levels.

The tail source reads file bytes in Python workers (the price of custom
per-file byte-offset semantics), so its throughput and thread scaling need
their own evidence, separate from the JVM text source. Method matches
tools/bench_scaling.py: the IDENTICAL drain runs at local[N] and local[4N]
(fresh JVM each, best of 2 warm runs) over the SAME materialized log
directory; the JVM whole-file text stream over the same files is reported
as the honest comparison point.

Usage: python tools/bench_tail.py [n_low] [total_mb]
Prints one JSON line and appends a section to BENCH.md when invoked with
--write-bench.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRAIN_CODE = """
import time
from loongcollector_spark.session import get_spark
spark = get_spark(master="local[{cpus}]", shuffle_partitions="{cpus}")
spark.sparkContext.setLogLevel("ERROR")
best = 1e18
for _ in range(2):
    t0 = time.time()
    if {tail}:
        from loongcollector_spark.sources.tail import tail_log_files
        df = tail_log_files(spark, "{path}/*.log",
                            max_partition_bytes={chunk})
    else:
        from pyspark.sql import functions as F
        df = (spark.readStream.format("text").load("{path}/*.log")
              .select(F.col("value").alias("content")))
    q = (df.writeStream.format("noop")
         .option("checkpointLocation", "{ckpt}/" + str(time.time()))
         .trigger(availableNow=True).start())
    q.awaitTermination(600)
    q.stop()
    best = min(best, time.time() - t0)
print("RESULT", best)
"""


def _gen_logs(path: str, total_mb: int) -> int:
    """Deterministic synthetic log dir: 8 files, ~64 B/line."""
    os.makedirs(path, exist_ok=True)
    n_files = 8
    per_file = total_mb * 1024 * 1024 // n_files
    lines = 0
    for i in range(n_files):
        with open(os.path.join(path, f"app-{i}.log"), "w") as f:
            written = 0
            j = 0
            while written < per_file:
                line = (
                    f"2024-01-01T10:{j % 60:02d}:{i:02d}Z stdout F "
                    f"msg type={j % 7} seq={j:09d}\n"
                )
                f.write(line)
                written += len(line)
                j += 1
            lines += j
    return lines


def _run(cpus: int, path: str, tail: bool, chunk: int) -> float:
    with tempfile.TemporaryDirectory() as ckpt:
        code = _DRAIN_CODE.format(
            cpus=cpus, path=path, tail=tail, chunk=chunk, ckpt=ckpt
        )
        out = subprocess.run(
            [sys.executable, "-c", code], cwd=REPO, capture_output=True,
            text=True, timeout=1800,
        )
        for ln in out.stdout.splitlines():
            if ln.startswith("RESULT "):
                return float(ln.split()[1])
    raise RuntimeError(f"no RESULT line:\n{out.stdout}\n{out.stderr}")


def _raw_reader_rate(logs: str, nproc: int, chunk: int) -> float:
    """The reader functions alone (no Spark) across a process pool — the
    design's own scaling ceiling, isolating it from the harness's
    per-task Python-source ingest cost."""
    from multiprocessing import Pool

    sys.path.insert(0, REPO)
    from loongcollector_spark.sources.tail import LogTailStreamReader

    r = LogTailStreamReader(
        {"path": f"{logs}/*.log", "max_partition_bytes": chunk}
    )
    parts = r.partitions({"files": {}}, r.latestOffset())
    chunks = [parts[i::nproc] for i in range(nproc)]
    t0 = __import__("time").time()
    with Pool(nproc) as pool:
        total = sum(pool.map(_raw_work, [(logs, chunk, c) for c in chunks]))
    return total / (__import__("time").time() - t0)


def _raw_work(args):
    logs, chunk, parts = args
    from loongcollector_spark.sources.tail import LogTailStreamReader

    r = LogTailStreamReader(
        {"path": f"{logs}/*.log", "max_partition_bytes": chunk}
    )
    return sum(b.num_rows for p in parts for b in r.read(p))


def main() -> None:
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    total_mb = int(sys.argv[2]) if len(sys.argv) > 2 else 240
    n_high = 4 * n_low
    # chunk so even one file splits across cores: total/(8 files) >> chunk
    chunk = 4 * 1024 * 1024
    with tempfile.TemporaryDirectory() as d:
        logs = os.path.join(d, "logs")
        n_lines = _gen_logs(logs, total_mb)
        t_low = _run(n_low, logs, tail=True, chunk=chunk)
        t_high = _run(n_high, logs, tail=True, chunk=chunk)
        t_text = _run(n_high, logs, tail=False, chunk=chunk)
        raw_low = _raw_reader_rate(logs, n_low, chunk)
        raw_high = _raw_reader_rate(logs, n_high, chunk)
    thr_low = n_lines / t_low
    thr_high = n_lines / t_high
    result = {
        "metric": "log_tail drain throughput (lines/sec)",
        "total_mb": total_mb,
        "lines": n_lines,
        "chunk_bytes": chunk,
        f"tail_local{n_low}_lines_per_sec": round(thr_low),
        f"tail_local{n_high}_lines_per_sec": round(thr_high),
        "scaling_efficiency": round(thr_high / (4 * thr_low), 3),
        f"jvm_text_stream_local{n_high}_lines_per_sec": round(
            n_lines / t_text
        ),
        f"raw_reader_{n_low}proc_lines_per_sec": round(raw_low),
        f"raw_reader_{n_high}proc_lines_per_sec": round(raw_high),
        "raw_scaling_efficiency": round(raw_high / (4 * raw_low), 3),
        "load_avg": round(os.getloadavg()[0], 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
