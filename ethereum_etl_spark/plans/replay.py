"""Batch replay — the reference's fixed-range export path, Spark-first.

Reference: ``export_klg_with_item_exporter(start_block, end_block, ...)``
(export_knowledge_graph_needed_common.py:51-249 — SURVEY.md §3.2) walks
1000-block partitions sequentially, exporting each through the mapper
pipeline into the sink.

Here: a seq-range predicate on the change-log scan (Catalyst pushes it into
the parquet reader — partition/file pruning at scale), the normalize stage,
and one idempotent MERGE per partition range. Replaying any range twice —
or overlapping ranges — converges to the same final state (the bit-for-bit
replay-equality requirement of BASELINE.json).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_spark.plans.merge import MergeMetrics, MergeTable
from ethereum_etl_spark.plans.normalize import normalize_changes


def read_changes(spark: SparkSession, source_path: str) -> DataFrame:
    return spark.read.parquet(source_path)


def replay_range(
    spark: SparkSession,
    source: str | DataFrame,
    table: MergeTable,
    start_seq: int,
    end_seq: int,
    partition_size: int | None = None,
    batch_prefix: str = "replay",
) -> list[MergeMetrics]:
    """Replay change events with ``start_seq <= seq <= end_seq`` into ``table``.

    ``partition_size`` splits the range into sequential merge partitions
    (the reference's 1000-block partitions, partition_service.py:28-74);
    ``None`` replays the whole range as one merge (fastest for bulk
    backfill). Returns per-partition MergeMetrics (lineage).
    """
    if start_seq < 0 or end_seq < start_seq:
        raise ValueError(f"invalid range [{start_seq}, {end_seq}]")
    changes = read_changes(spark, source) if isinstance(source, str) else source

    ranges: list[tuple[int, int]]
    if partition_size is None:
        ranges = [(start_seq, end_seq)]
    else:
        ranges = [
            (s, min(s + partition_size - 1, end_seq))
            for s in range(start_seq, end_seq + 1, partition_size)
        ]

    out: list[MergeMetrics] = []
    for s, e in ranges:
        batch = normalize_changes(
            changes.filter((F.col("seq") >= s) & (F.col("seq") <= e))
        )
        m = table.merge(batch, batch_id=f"{batch_prefix}-{s:012d}-{e:012d}")
        out.append(m)
    return out


def replay_throughput(metrics: list[MergeMetrics]) -> dict:
    """Aggregate lineage into the headline numbers (events/sec, merge latency)."""
    total_rows = sum(m.rows_in for m in metrics)
    total_sec = sum(m.seconds for m in metrics)
    return {
        "change_events": total_rows,
        "wall_seconds": round(total_sec, 3),
        "events_per_sec": round(total_rows / total_sec, 1) if total_sec else None,
        "merge_latency_avg_sec": round(total_sec / len(metrics), 3) if metrics else None,
        "partitions": len(metrics),
        "ts": time.time(),
    }
