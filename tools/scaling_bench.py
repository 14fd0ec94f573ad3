"""Scaling-efficiency evidence: the same CDC replay job at multiple
parallelism levels (local[N]) on the SAME materialized input.

The sandbox has no multi-node cluster, so N -> 4N executors is evidenced by
N -> 4N local cores (the north_rule's two-cluster-size criterion stand-in).

Measurement protocol (this VM's vCPUs are hypervisor-throttled with
time-varying capacity — single-shot timings swing ±50%):
- trials are INTERLEAVED across levels (1,4,16, 1,4,16, ...) so slow/fast
  host phases hit every level equally;
- the median wall time per level is reported;
- a raw CPU probe (multiprocessing sha256 burn) is run alongside to record
  what the box itself sustains at each level — the ceiling no job can beat.

Usage:
    python tools/scaling_bench.py                      # orchestrate, print JSON
    python tools/scaling_bench.py --run CPUS DIR       # child: one measurement
Env: SCALING_BENCH_ROWS (default 2000000), SCALING_BENCH_CPUS (default 1,4,16),
     SCALING_BENCH_TRIALS (default 3).
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import os
import statistics
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

N_ROWS = int(os.environ.get("SCALING_BENCH_ROWS", "2000000"))
CPU_LEVELS = tuple(
    int(x) for x in os.environ.get("SCALING_BENCH_CPUS", "1,4,16").split(",")
)
TRIALS = int(os.environ.get("SCALING_BENCH_TRIALS", "3"))


def child(cpus: int, log_dir: str) -> None:
    from ethereum_etl_spark.plans.merge import MergeTable
    from ethereum_etl_spark.plans.replay import replay_range
    from ethereum_etl_spark.session import get_spark

    # shuffle_partitions = 3x cores (same rule at every level, so the
    # comparison stays fair): 1 partition per core leaves stragglers
    # starving cores at the merge-sort tail — measured 29.1s -> 23.4s at 16
    # cores on the same input
    spark = get_spark(
        f"scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=max(3 * cpus, 3)
    )
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # warm the FULL path (scan -> normalize codegen -> window -> parquet
    # write/commit) with a small replay so the timed run is steady-state:
    # JVM/JIT/codegen warmup is a constant adder that would otherwise be
    # misread as an (anti-)scaling term at high core counts
    import shutil

    warm_root = tempfile.mkdtemp(prefix=f"warm_{cpus}_")
    warm = MergeTable(spark, warm_root, n_buckets=8)
    replay_range(spark, log_dir, warm, 0, min(49_999, N_ROWS - 1), partition_size=None)
    # the warm table served its purpose; don't let 9 trials x 5 levels of
    # warm-up tables chew the disk headroom this bench depends on
    shutil.rmtree(warm_root, ignore_errors=True)

    root = tempfile.mkdtemp(prefix=f"scal_{cpus}_")
    # merge_salts=4: the salted merge-apply window (north rule) at every
    # level — decouples sort parallelism from the bucket count
    table = MergeTable(spark, root, n_buckets=64, merge_salts=4)
    t0 = time.time()
    replay_range(spark, log_dir, table, 0, N_ROWS - 1, partition_size=None)
    wall = time.time() - t0
    print(json.dumps({"cpus": cpus, "wall_sec": round(wall, 3)}))
    # a full-size replayed table per trial exhausts the disk across a
    # 9-trial run (disk-full masquerades as throttling) — clean as we go
    shutil.rmtree(root, ignore_errors=True)


def _burn(n: int) -> None:
    h = b"x"
    for _ in range(n):
        h = hashlib.sha256(h).digest()


def cpu_probe(procs: int, n: int = 4_000_000) -> float:
    """Aggregate sha256/sec the OS sustains at this process count."""
    t0 = time.time()
    with mp.Pool(procs) as p:
        p.map(_burn, [n] * procs)
    return n * procs / (time.time() - t0)


def orchestrate() -> None:
    from ethereum_etl_spark.session import get_spark
    from ethereum_etl_spark.sources.datagen import write_repo_changes

    log_dir = tempfile.mkdtemp(prefix="scaling_log_")
    spark = get_spark("scaling-datagen", master="local[16]")
    # fixed partition count -> identical input layout for every run
    write_repo_changes(spark, log_dir, N_ROWS, seed=42, partitions=64)
    spark.stop()

    walls: dict[int, list[float]] = {c: [] for c in CPU_LEVELS}
    probes: dict[int, list[float]] = {c: [] for c in CPU_LEVELS}
    for _trial in range(TRIALS):
        for cpus in CPU_LEVELS:  # interleaved: every level sees every host phase
            for attempt in (1, 2):  # transient child crashes (host pressure)
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--run", str(cpus), log_dir],
                    capture_output=True, text=True, cwd="/root/repo",
                )
                if out.returncode == 0:
                    break
                sys.stderr.write(
                    f"child cpus={cpus} attempt {attempt} failed:\n"
                    + out.stderr[-1500:] + "\n"
                )
            else:
                continue  # skip this trial for this level; medians tolerate it
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            walls[cpus].append(json.loads(line)["wall_sec"])
            probes[cpus].append(cpu_probe(cpus))

    import shutil

    shutil.rmtree(log_dir, ignore_errors=True)
    # a level whose every trial failed (both attempts, all trials) has no
    # walls — report it as absent instead of letting median([]) throw away
    # the whole run's results
    ok_levels = [c for c in CPU_LEVELS if walls[c]]
    for c in CPU_LEVELS:
        if c not in ok_levels:
            sys.stderr.write(f"level cpus={c}: no successful trials, omitted\n")
    med = {c: statistics.median(walls[c]) for c in ok_levels}
    thr = {c: round(N_ROWS / med[c], 1) for c in ok_levels}
    probe_med = {c: round(statistics.median(probes[c]) / 1e6, 2) for c in ok_levels}

    pairs = []
    levels = sorted(ok_levels)
    for lo, hi in zip(levels, levels[1:]):
        ratio = hi / lo
        speed = thr[hi] / thr[lo]
        ceil = probe_med[hi] / probe_med[lo]
        pairs.append({
            "from_cpus": lo, "to_cpus": hi,
            "speedup": round(speed, 3),
            "efficiency": round(speed / ratio, 3),
            "os_cpu_ceiling_speedup": round(ceil, 3),
            "os_cpu_ceiling_efficiency": round(ceil / ratio, 3),
        })

    print(json.dumps({
        "rows": N_ROWS,
        "trials": TRIALS,
        "median_wall_sec": med,
        "events_per_sec": thr,
        "os_cpu_probe_Msha_per_sec": probe_med,
        "pairs": pairs,
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--run":
        child(int(sys.argv[2]), sys.argv[3])
    else:
        orchestrate()
