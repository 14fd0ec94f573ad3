"""Per-token partitioned transfer layout — the reference's dynamic
per-token Mongo collections, lakehouse-native.

Reference: ``insert_to_token_collection`` (mongo_db.py:104-113) creates one
Mongo collection PER TOKEN ADDRESS on first sight, with hashed indexes on
``transaction_hash`` and ``block_number``; queries for one token's
transfers never touch another token's data.

Spark-first mapping:

- one collection per token  →  ``partitionBy("token_address")``: each token
  is its own directory, and a token-filtered read is a *partition-pruned*
  scan (Catalyst shows it under ``PartitionFilters`` — zero I/O for other
  tokens, the exact per-collection isolation the reference buys from Mongo);
- the ``block_number`` index  →  ``sortWithinPartitions`` before the write:
  parquet row-group min/max stats on a sorted column make block-range
  predicates skip row groups (``PushedFilters``);
- the ``transaction_hash`` index  →  unnecessary as a structure; an
  equality predicate pushes down to the scan, and point-lookup-heavy
  workloads belong in the bucketed MergeTable instead.

Scale note: hash-repartitioning on ``token_address`` lands each token in
exactly one task, so each partition directory holds one block-sorted file.
Hot tokens (the USDT problem) make that one file huge — bound it with
``max_records_per_file``: the writer splits the sorted partition
sequentially, so every split file is still block-sorted with
NON-overlapping block ranges (row-group/file skipping keeps working).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_transfers_by_token(
    transfers: DataFrame,
    path: str,
    sort_col: str = "block_number",
    max_records_per_file: int | None = None,
) -> None:
    """Write transfers partitioned by token (one dir per token, files
    block-sorted). ``max_records_per_file`` bounds hot-token file sizes."""
    writer = (
        transfers.repartition("token_address")
        .sortWithinPartitions("token_address", sort_col)
        .write.mode("overwrite")
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy("token_address").parquet(path)


def read_token_transfers(
    spark: SparkSession,
    path: str,
    tokens: list[str] | None = None,
    start_block: int | None = None,
    end_block: int | None = None,
    block_col: str = "block_number",
) -> DataFrame:
    """Read back with per-token partition pruning and block-range row-group
    skipping — the reference's 'query one token collection by block index'
    access path."""
    df = spark.read.parquet(path)
    if tokens is not None:
        df = df.filter(F.col("token_address").isin(list(tokens)))
    if start_block is not None:
        df = df.filter(F.col(block_col) >= start_block)
    if end_block is not None:
        df = df.filter(F.col(block_col) <= end_block)
    return df
