"""Two-cluster-size scaling run (the north rule's N vs 4N executor criterion).

No real cluster exists in this sandbox, so the criterion is evidenced the way
BASELINE.json prescribes: the IDENTICAL pipeline job runs at two parallelism
levels (local[N] and local[4N], fresh JVM each) over the SAME materialized
input, and we report throughput at both plus

    scaling_efficiency = throughput(4N) / (4 * throughput(N))

The reference's analogue is its config-scaling / multi-core benchmark rig
(test/benchmark/test_cases/, docs/cn/benchmark/).

Usage: python tools/bench_scaling.py [n_low] [n_rows]
Writes BENCH.md at the repo root and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cpus: int, n_rows: int) -> dict:
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_CPUS": str(cpus),
            "LC_BENCH_SKIP_QUERIES": "1",
            "LC_BENCH_ROWS": str(n_rows),
        }
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        cwd=REPO,
        check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    n_high = n_low * 4

    # Warm-up at high parallelism materializes the shared input parquet once,
    # so neither measured run pays generation cost.
    run_once(n_high, n_rows)

    low = run_once(n_low, n_rows)
    high = run_once(n_high, n_rows)

    tp_low = low["pipeline"]["sequences_per_sec"]
    tp_high = high["pipeline"]["sequences_per_sec"]
    tok_low = low["pipeline"]["tokens_per_sec"]
    tok_high = high["pipeline"]["tokens_per_sec"]
    eff = tp_high / (4 * tp_low)
    nat_low = low["pipeline"].get("token_native_sequences_per_sec")
    nat_high = high["pipeline"].get("token_native_sequences_per_sec")
    nat_eff = nat_high / (4 * nat_low) if nat_low and nat_high else None

    report = {
        "metric": "scaling_efficiency_Nx4N",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_rows": n_rows,
        "low": {"cpus": n_low, "seq_per_sec": tp_low, "tok_per_sec": tok_low,
                "elapsed_sec": low["pipeline"]["elapsed_sec"]},
        "high": {"cpus": n_high, "seq_per_sec": tp_high, "tok_per_sec": tok_high,
                 "elapsed_sec": high["pipeline"]["elapsed_sec"]},
        "pass": eff >= 0.8,
        "token_native": {"low_seq_per_sec": nat_low, "high_seq_per_sec": nat_high,
                          "efficiency": round(nat_eff, 3) if nat_eff else None},
    }
    print(json.dumps(report))

    md = f"""# BENCH — throughput & two-parallelism scaling

End-to-end pipeline (read tokenized sequences → Arrow pandas_udf detok render →
regex/JSON/delimiter parse → dict_map enrich → first-match route → shard-hash
→ 4 noop sinks + salted per-(source,sink) rollup), {n_rows:,} sequences,
identical input parquet for both runs, fresh JVM per run.

| parallelism | sequences/sec | tokens/sec | elapsed (s) |
|---|---|---|---|
| local[{n_low}] (N) | {tp_low:,.0f} | {tok_low:,.0f} | {low['pipeline']['elapsed_sec']} |
| local[{n_high}] (4N) | {tp_high:,.0f} | {tok_high:,.0f} | {high['pipeline']['elapsed_sec']} |

**Scaling efficiency (throughput(4N) / (4 × throughput(N))) = {eff:.3f}**
(north-rule threshold ≥ 0.8: {"PASS" if eff >= 0.8 else "FAIL"}).

Token-native variant (fields from header tokens via `element_at`/`pmod`, no
detok render, no regex — `operators/token_ops.py`):
local[{n_low}] {nat_low or float('nan'):,.0f} seq/s → local[{n_high}]
{nat_high or float('nan'):,.0f} seq/s, efficiency
{(nat_eff if nat_eff else float('nan')):.3f}.

Reference baseline for context: LoongCollector claims 100 MB/s/core simple
collection (docs/cn/benchmark/performance-compare-with-filebeat.md:5); our
per-sequence lines average ~100 bytes, so sequences/sec above is directly
comparable as bytes/sec ÷ 100.
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as fh:
        fh.write(md)


if __name__ == "__main__":
    main()
