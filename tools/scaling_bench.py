"""Scaling-efficiency evidence: the same CDC replay job at two parallelism
levels (local[8] vs local[32]) on the SAME materialized input.

The sandbox has no multi-node cluster, so N -> 4N executors is evidenced by
N -> 4N local cores (the north_rule's two-cluster-size criterion stand-in):

    efficiency = (throughput_32 / throughput_8) / (32 / 8)

Each measurement runs in its own subprocess (one JVM per master setting).
The input change log is generated once by the parent and shared read-only.

Usage:
    python tools/scaling_bench.py                 # orchestrate, print JSON
    python tools/scaling_bench.py --run CPUS DIR  # child: one measurement
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

N_ROWS = int(os.environ.get("SCALING_BENCH_ROWS", "2000000"))
CPU_LEVELS = (8, 32)


def child(cpus: int, log_dir: str) -> None:
    from ethereum_etl_spark.plans.merge import MergeTable
    from ethereum_etl_spark.plans.replay import replay_range
    from ethereum_etl_spark.session import get_spark

    spark = get_spark(
        f"scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # warm the JVM/Python-worker pools so the measurement is steady-state
    spark.read.parquet(log_dir).limit(10_000).count()

    root = tempfile.mkdtemp(prefix=f"scal_{cpus}_")
    table = MergeTable(spark, root, n_buckets=64)
    t0 = time.time()
    replay_range(spark, log_dir, table, 0, N_ROWS - 1, partition_size=None)
    wall = time.time() - t0
    print(json.dumps({"cpus": cpus, "wall_sec": round(wall, 3),
                      "events_per_sec": round(N_ROWS / wall, 1)}))


def orchestrate() -> None:
    from ethereum_etl_spark.session import get_spark
    from ethereum_etl_spark.sources.datagen import write_repo_changes

    log_dir = tempfile.mkdtemp(prefix="scaling_log_")
    spark = get_spark("scaling-datagen", master="local[32]")
    # fixed partition count -> identical input layout for both runs
    write_repo_changes(spark, log_dir, N_ROWS, seed=42, partitions=64)
    spark.stop()

    results = {}
    for cpus in CPU_LEVELS:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run", str(cpus), log_dir],
            capture_output=True, text=True, cwd="/root/repo", check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)

    lo, hi = CPU_LEVELS
    speedup = results[hi]["events_per_sec"] / results[lo]["events_per_sec"]
    eff = speedup / (hi / lo)
    print(json.dumps({
        "rows": N_ROWS,
        "runs": list(results.values()),
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--run":
        child(int(sys.argv[2]), sys.argv[3])
    else:
        orchestrate()
