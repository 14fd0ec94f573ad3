"""Per-token partitioned transfers: the reference's dynamic per-token Mongo
collections (mongo_db.py:104-113) as a partition-pruned parquet layout."""

import os

from pyspark.sql import functions as F

from ethereum_etl_spark.sinks.partitioned import (
    read_token_transfers,
    write_transfers_by_token,
)


def _transfers(spark, n=400, tokens=4):
    return spark.range(n).select(
        F.concat(F.lit("0xtok"), (F.col("id") % tokens).cast("string")).alias(
            "token_address"
        ),
        F.concat(F.lit("0xtx"), F.col("id").cast("string")).alias("transaction_hash"),
        (F.col("id") % 97).alias("block_number"),
        (F.col("id") * 3).cast("decimal(38,0)").cast("string").alias("value"),
    )


def test_layout_one_dir_per_token_sorted_files(spark, tmp_path):
    path = str(tmp_path / "by_token")
    write_transfers_by_token(_transfers(spark), path)
    dirs = sorted(d for d in os.listdir(path) if d.startswith("token_address="))
    assert dirs == [f"token_address=0xtok{i}" for i in range(4)]
    # one file per token (single task per token), rows block-sorted inside
    for d in dirs:
        files = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
        assert len(files) == 1
    one = spark.read.parquet(os.path.join(path, dirs[0]))
    blocks = [r[0] for r in one.select("block_number").collect()]
    assert blocks == sorted(blocks)


def test_read_is_partition_pruned_and_block_pushed(spark, tmp_path):
    path = str(tmp_path / "by_token")
    write_transfers_by_token(_transfers(spark), path)
    got = read_token_transfers(
        spark, path, tokens=["0xtok2"], start_block=10, end_block=50
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    # token filter prunes partitions (scan-level, not a post-filter)...
    assert "PartitionFilters" in plan and "0xtok2" in plan
    # ...and the block range reaches the parquet reader
    assert "PushedFilters" in plan and "block_number" in plan
    rows = got.collect()
    assert rows and all(r["token_address"] == "0xtok2" for r in rows)
    assert all(10 <= r["block_number"] <= 50 for r in rows)
    expect = (
        _transfers(spark)
        .filter(
            (F.col("token_address") == "0xtok2")
            & F.col("block_number").between(10, 50)
        )
        .count()
    )
    assert len(rows) == expect


def test_hot_token_split_files_stay_sorted(spark, tmp_path):
    path = str(tmp_path / "split")
    write_transfers_by_token(_transfers(spark, n=600, tokens=2), path,
                             max_records_per_file=120)
    for d in os.listdir(path):
        if not d.startswith("token_address="):
            continue
        full = os.path.join(path, d)
        files = sorted(f for f in os.listdir(full) if f.endswith(".parquet"))
        assert len(files) == 3  # 300 rows / 120 cap, sequential splits
        # each split file individually block-sorted (non-overlapping ranges
        # come for free from the sequential split of a sorted partition)
        for f in files:
            blocks = [
                r[0]
                for r in spark.read.parquet(os.path.join(full, f))
                .select("block_number")
                .collect()
            ]
            assert blocks == sorted(blocks)
    # pruned read still correct
    got = read_token_transfers(spark, path, tokens=["0xtok1"])
    assert got.count() == 300
