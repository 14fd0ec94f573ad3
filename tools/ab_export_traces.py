"""A/B the two flatten variants feeding export_traces on ONE host phase
(round-3 verdict item: BENCH_r02 -> r03 showed export_traces 1.78 -> 3.81 s
with no recorded explanation). Interleaved trials, medians, same session —
the result is recorded in BASELINE.md.

Variants:
  structured — flatten_geth_traces_structured (single-parse pure-JVM)
  kernel     — flatten_geth_traces (Arrow-batched mapInPandas)
Both run over the SAME materialized synthetic trace parquet (the round-4
`_synth_mat` barrier — production trace scans are parquet-fed), so the A/B
measures the flatten+export stage, not the harness synthesis expression.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402
from ethereum_etl_spark.operators.traces import (  # noqa: E402
    flatten_geth_traces,
    flatten_geth_traces_structured,
)
from ethereum_etl_spark.plans.entities import export_traces  # noqa: E402
from ethereum_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    trials = int(os.environ.get("AB_TRIALS", "3"))
    spark = get_spark(
        "ab-export-traces", master=f"local[{cpus}]", shuffle_partitions=cpus * 3
    )
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    traces = entry._synth_traces(spark, sf_dir)  # materialized once, shared

    def run(flatten) -> float:
        from pyspark.sql import functions as F

        out = export_traces(flatten(traces))
        out = out.select(
            *[c for c in out.columns if c != "value"],
            F.col("value").cast("string").alias("value"),
        )
        t0 = time.time()
        out.write.mode("overwrite").format("noop").save()
        return round(time.time() - t0, 3)

    variants = {"structured": flatten_geth_traces_structured, "kernel": flatten_geth_traces}
    walls: dict[str, list[float]] = {k: [] for k in variants}
    for k, fn in variants.items():  # warmup: codegen + Python workers
        run(fn)
    for _ in range(trials):
        for k, fn in variants.items():  # interleaved
            walls[k].append(run(fn))
    print(json.dumps({
        "sf_dir": sf_dir, "cpus": cpus, "trials": trials,
        "wall_sec": walls,
        "median_sec": {k: statistics.median(v) for k, v in walls.items()},
    }))


if __name__ == "__main__":
    main()
