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


def find_divergence_seq(
    table: MergeTable,
    changes: DataFrame,
    probe_from: int = 0,
) -> int | None:
    """First seq where the committed state disagrees with the canonical
    change log — the reorg point.

    The reference avoids most reorgs with a head lag (streamer.py:110-111)
    and relies on restart re-export for the rest; it never *locates* the
    fork. Here the per-row sha256 invariant (BASELINE.json: "content sha256
    equality") makes detection declarative: equi-join committed rows to the
    canonical log on the seq slot, keep rows whose sha256 disagrees, take
    min(seq). One shuffle on seq, a single-row aggregate back to the driver
    — scale-safe at 10^10 rows (``probe_from`` bounds the scan to the
    suspect tail; the seq predicate is pushed into both scans).

    Returns None when the committed state matches the log everywhere.
    """
    committed = table.read().filter(F.col("seq") >= probe_from).select(
        "seq", F.col("sha256").alias("_committed_sha")
    )
    canonical = normalize_changes(
        changes.filter(F.col("seq") >= probe_from), with_decimal_value=False
    ).select("seq", "sha256")
    row = (
        canonical.join(committed, "seq", "inner")
        .filter(F.col("sha256") != F.col("_committed_sha"))
        .agg(F.min("seq").alias("fork_seq"))
        .collect()[0]
    )
    return row["fork_seq"]


def reexport_range(
    spark: SparkSession,
    source: str | DataFrame,
    table: MergeTable,
    start_seq: int,
    end_seq: int,
    partition_size: int | None = None,
) -> list[MergeMetrics]:
    """Reorg-aware re-export: replay [start_seq, end_seq] from the canonical
    log over whatever the table currently holds for those slots.

    Convergence needs no delete path: MergeTable resolves equal-``order_col``
    collisions to the latest snapshot (merge.py §2 "__snap desc"), so a
    re-exported slot shadows its orphaned predecessor — the reference's
    restart-re-export semantic (streamer.py: resume re-exports from
    last_synced_block) made explicit. A distinct batch prefix keeps the
    batch-id idempotence ledger from skipping ranges the orphaned ingest
    already claimed.
    """
    return replay_range(
        spark, source, table, start_seq, end_seq,
        partition_size=partition_size, batch_prefix="reexport",
    )


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
