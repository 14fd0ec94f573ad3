"""Drift-or-real check for bench regressions with NO code change (round-4
verdict item 2: embedding_near_dup_banded 8.3 -> 9.9 -> 11.4 s across
rounds, dedup_simhash_hamming +34%, ann_topk_brute +27% — all above the
~16% host phase tax).

Protocol (same discipline as ab_export_traces + scaling_bench): ONE
session, per-query warm-up, then N interleaved trials with a raw-CPU
probe (multiprocessing sha256 burn) sampled between every trial — the
probe is the host-capacity control. A regression that disappears after
probe normalization is hypervisor drift; one that survives is a real
plan change to hunt. Result JSON is recorded in BASELINE.md.

Usage: python tools/ab_drift_check.py [query ...]   (default: the three)
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402
from ethereum_etl_spark.session import get_spark  # noqa: E402

DEFAULT = ["embedding_near_dup_banded", "dedup_simhash_hamming", "ann_topk_brute"]


def _burn(n: int) -> None:
    h = b"x"
    for _ in range(n):
        h = hashlib.sha256(h).digest()


def cpu_probe(procs: int, n: int = 2_000_000) -> float:
    """Aggregate Msha256/sec the OS sustains at this process count."""
    t0 = time.time()
    ps = [mp.Process(target=_burn, args=(n,)) for _ in range(procs)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return procs * n / (time.time() - t0) / 1e6


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    trials = int(os.environ.get("AB_TRIALS", "3"))
    spark = get_spark(
        "ab-drift", master=f"local[{cpus}]", shuffle_partitions=cpus * 3
    )
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    qfns = entry.queries()

    def run(name: str) -> float:
        t0 = time.time()
        qfns[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        return round(time.time() - t0, 3)

    for name in names:  # warm-up: codegen, scratch materializations, workers
        run(name)
    walls: dict[str, list[float]] = {n: [] for n in names}
    probes: list[float] = [round(cpu_probe(cpus), 2)]
    for _ in range(trials):
        for name in names:
            walls[name].append(run(name))
        probes.append(round(cpu_probe(cpus), 2))
    print(json.dumps({
        "sf_dir": sf_dir, "cpus": cpus, "trials": trials,
        "wall_sec": walls,
        "median_sec": {n: statistics.median(v) for n, v in walls.items()},
        "probe_Msha_per_sec": probes,
        "probe_median": round(statistics.median(probes), 2),
    }))


if __name__ == "__main__":
    main()
