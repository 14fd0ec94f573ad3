"""Stateful running balances — the reference's only genuinely stateful
operator (A3/A4/J1/J6), as window aggregation.

Reference: ``_update_balance``
(/root/reference/ethereumetl/jobs/export_blocks_job.py:160-222 and
export_token_transfers_job.py:155-211): for every transfer, each side's new
balance = previous balance ± value, where "previous" is a cache hit or an
RPC point read at block−1; results are folded into per-wallet
``{token: balance}`` maps (knowledge_graph_exporter.py:99-143).

Spark-first: explode each transfer into two signed deltas, then a cumulative
sum over ``Window.partitionBy(address, token).orderBy(seq, ...)``. At
10^10 rows the partition key (address, token) is high-cardinality, so the
sort is per-key-group and local to its hash partition — no global sort; for
incremental/streaming use, fold each micro-batch's per-key totals into a
state table via MergeTable (see ``fold_batch_totals``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transfers_to_deltas(transfers: DataFrame) -> DataFrame:
    """token_transfers → signed per-address deltas (two rows per transfer).

    Input: token_address, from_address, to_address, value (numeric),
    block_number, log_index. The from-side gets −value, the to-side +value
    (export_blocks_job.py:176-205 does the same with two point updates).
    """
    sides = F.array(
        F.struct(F.col("from_address").alias("address"), (-F.col("value")).alias("delta")),
        F.struct(F.col("to_address").alias("address"), F.col("value").alias("delta")),
    )
    return (
        transfers.withColumn("_side", F.explode(sides))
        .select(
            F.col("_side.address").alias("address"),
            F.col("token_address"),
            F.col("_side.delta").alias("delta"),
            F.col("block_number"),
            F.col("log_index"),
        )
    )


def running_balances(deltas: DataFrame) -> DataFrame:
    """Cumulative balance per (address, token) ordered by (block, log_index).

    Emits old_balance/new_balance per event — the reference's
    (pre_balance, balance) pair (wallet_mapper.py:4-16). Deterministic under
    parallel replay because the order key is total within each partition key.
    """
    w = (
        Window.partitionBy("address", "token_address")
        .orderBy("block_number", "log_index", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    new_bal = F.sum("delta").over(w)
    return deltas.select(
        "address",
        "token_address",
        "block_number",
        "log_index",
        "delta",
        (new_bal - F.col("delta")).alias("old_balance"),
        new_bal.alias("new_balance"),
    )


def balance_map_fold(balances: DataFrame) -> DataFrame:
    """Final per-wallet state: {token: balance} map + at_block high-water mark
    (knowledge_graph_exporter.py:99-143 A4). Balances stringified like the
    reference's sink (:124)."""
    latest = balances.groupBy("address", "token_address").agg(
        F.max_by("new_balance", F.struct("block_number", "log_index")).alias("balance"),
        F.max("block_number").alias("at_block"),
    )
    return latest.groupBy("address").agg(
        F.map_from_entries(
            F.collect_list(F.struct("token_address", F.col("balance").cast("string")))
        ).alias("balance"),
        F.max("at_block").alias("at_block_number"),
    )


def fold_batch_totals(deltas: DataFrame) -> DataFrame:
    """Streaming-state path: per-key totals of one micro-batch, ready to be
    MERGEd (added) into a balances state table — the map-side-combine that
    keeps state updates O(distinct keys), not O(events)."""
    return deltas.groupBy("address", "token_address").agg(
        F.sum("delta").alias("delta"),
        F.max("block_number").alias("block_number"),
        F.count("*").alias("n_events"),
    )


def as_of_previous(df: DataFrame, key_cols: list[str], order_cols: list[str], value_col: str) -> DataFrame:
    """As-of self-join: previous value per key (J6 — balance at block N−1 via
    lag() instead of an RPC point read, export_blocks_job.py:180-182)."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return df.withColumn(f"prev_{value_col}", F.lag(value_col).over(w))
