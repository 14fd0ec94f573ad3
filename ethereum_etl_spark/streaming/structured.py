"""Structured Streaming ingest — the readStream/foreachBatch variant.

The Streamer in stream.py reimplements the reference's explicit poll loop
(offset math, lag, batch caps) for exact semantic parity; this module is the
fully idiomatic Spark alternative: a file-source ``readStream`` over the
change-log directory, ``foreachBatch`` feeding the same idempotent
MergeTable, and Spark's own checkpointLocation for offset tracking
(replaces last_synced_block.txt, streamer.py:124-139).

Exactly-once: Spark guarantees each batch_id is delivered at-least-once
across restarts; MergeTable.merge is idempotent per batch_id, which upgrades
the pair to exactly-once effective — the standard foreachBatch pattern.

At scale: maxFilesPerTrigger bounds each micro-batch (the reference's
block_batch_size cap, streamer.py:112); a real deployment would swap the
file source for an Iceberg/Kafka incremental source with the same body.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ethereum_etl_spark.plans.merge import MergeTable
from ethereum_etl_spark.plans.normalize import normalize_changes
from ethereum_etl_spark.sources.datagen import CHANGE_LOG_SCHEMA


def stream_changes_to_table(
    spark: SparkSession,
    source_dir: str,
    table: MergeTable,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Start (and with available_now=True, drain) a streaming ingest query.

    Returns the StreamingQuery; with ``available_now`` the call blocks until
    everything currently visible is merged, then stops — the batch-replay
    equivalence path (same normalize + merge as replay_range).
    """
    reader = spark.readStream.schema(CHANGE_LOG_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    changes = reader.parquet(source_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        table.merge(normalize_changes(batch_df), batch_id=f"ss-{batch_id:012d}")

    writer = (
        changes.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
