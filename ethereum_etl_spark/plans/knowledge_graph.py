"""Knowledge-graph export — the reference's flagship composite pipeline
(SURVEY.md §3.1), one declarative DAG.

Reference: ``export_klg_with_item_exporter``
(export_knowledge_graph_needed_common.py:51-249) runs, per block range,
sequentially: ExportBlocksJob -> ExportTokenTransfersJob ->
ExportSubscriberEventsJob (per ABI) -> daily ExportTokensJob, each pushing
row dicts into the type-dispatched Mongo exporter
(knowledge_graph_exporter.py:32-143).

Here the whole cycle is ONE pass over the raw data: every entity table is a
DataFrame derived from the same scans (Catalyst shares/prunes them), and
each lands in its own idempotent MergeTable keyed like the reference's Mongo
collections (mongo_db.py:33-43):

    blocks           keyed (number)
    transactions     keyed (hash)
    token_transfers  keyed (transaction_hash, log_index)
    events           keyed (transaction_hash, log_index)
    wallets          keyed (address)            <- balance-map fold upsert

Unlike the reference (which swallows per-job errors and advances the
checkpoint anyway, base_job.py:28-35), a failure in ANY entity merge aborts
the cycle before the checkpoint write — the whole range is retried and the
batch-id-idempotent merges make the retry exact.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_spark.operators.balances import (
    fold_batch_totals,
    transfers_to_deltas,
)
from ethereum_etl_spark.operators.events import EventAbi, decode_events
from ethereum_etl_spark.operators.transfers import extract_token_transfers
from ethereum_etl_spark.plans.entities import export_blocks, export_transactions
from ethereum_etl_spark.plans.merge import MergeMetrics, MergeTable


@dataclass
class KnowledgeGraphTables:
    """One MergeTable per entity, keyed like the reference's collections."""

    blocks: MergeTable
    transactions: MergeTable
    token_transfers: MergeTable
    events: MergeTable
    wallets: MergeTable

    @classmethod
    def create(cls, spark: SparkSession, root: str, n_buckets: int = 16) -> "KnowledgeGraphTables":
        return cls(
            blocks=MergeTable(spark, f"{root}/blocks", merge_keys=["number"],
                              order_col="number", n_buckets=n_buckets),
            transactions=MergeTable(spark, f"{root}/transactions", merge_keys=["hash"],
                                    order_col="block_number", n_buckets=n_buckets),
            token_transfers=MergeTable(
                spark, f"{root}/token_transfers",
                merge_keys=["transaction_hash", "log_index"],
                order_col="block_number", n_buckets=n_buckets),
            events=MergeTable(spark, f"{root}/events",
                              merge_keys=["transaction_hash", "log_index"],
                              order_col="block_number", n_buckets=n_buckets),
            # normalized wallet state: one row per (address, token) — the
            # reference's per-wallet {token: balance} map is a VIEW over this
            # (wallet_map_view below); normalized rows make the accumulate
            # step a plain join+add instead of a map merge
            wallets=MergeTable(spark, f"{root}/wallets",
                               merge_keys=["address", "token_address"],
                               order_col="at_block_number", n_buckets=n_buckets),
        )


@dataclass
class CycleResult:
    metrics: dict[str, MergeMetrics] = field(default_factory=dict)

    def rows(self) -> dict[str, int]:
        return {k: m.rows_in for k, m in self.metrics.items()}


def is_log_filter_supported(provider_uri: str) -> bool:
    """F8 capability flag (export_knowledge_graph_needed_common.py:47-48):
    some providers cannot serve server-side log filters; the reference skips
    the transfer job for them ('infura' not in uri). Kept verbatim so a
    reference user's gating behaves identically."""
    return "infura" not in provider_uri


def export_knowledge_graph(
    raw_blocks: DataFrame,
    raw_logs: DataFrame,
    tables: KnowledgeGraphTables,
    abis: list[EventAbi] | None = None,
    token_filter: list[str] | None = None,
    batch_id: str = "klg",
    log_filter_supported: bool = True,
) -> CycleResult:
    """One export cycle over a range's raw blocks + logs.

    The reference runs four sequential jobs re-fetching overlapping data;
    here each entity is a derivation of the same two scans and merges are
    the only actions.

    ``log_filter_supported=False`` (F8, see ``is_log_filter_supported``)
    skips the transfer extraction and the wallet accumulate that depends on
    it — exactly the reference's capability gate around
    ExportTokenTransfersJob (:109).
    """
    out = CycleResult()

    blocks = export_blocks(raw_blocks)
    out.metrics["blocks"] = tables.blocks.merge(blocks, f"{batch_id}-blocks")

    txs = export_transactions(raw_blocks)
    out.metrics["transactions"] = tables.transactions.merge(txs, f"{batch_id}-txs")

    tf_typed = None
    if log_filter_supported:
        transfers = extract_token_transfers(raw_logs, token_filter=token_filter)
        tf_typed = transfers.withColumn("value", F.col("value").cast("decimal(38,0)"))
        out.metrics["token_transfers"] = tables.token_transfers.merge(
            tf_typed.withColumn("value", F.col("value").cast("string")),
            f"{batch_id}-transfers",
        )

    if abis:
        decoded = None
        for abi in abis:
            d = decode_events(raw_logs, abi)
            decoded = d if decoded is None else decoded.unionByName(
                d, allowMissingColumns=True
            )  # additive schema union (SURVEY §1.3): per-ABI params columns
        out.metrics["events"] = tables.events.merge(decoded, f"{batch_id}-events")

    # wallet state (A3/A4/J4): read-modify-write accumulate, the reference's
    # get_wallet -> merge balances -> replace_wallet upsert
    # (knowledge_graph_exporter.py:99-143) as join + add + idempotent merge.
    # Crash-replay safety: re-merging the same batch_id is a no-op, so the
    # addition can never double-count (exactly-once effective).
    if tf_typed is None:  # F8: no transfers -> no wallet deltas this cycle
        return out
    totals = fold_batch_totals(transfers_to_deltas(tf_typed)).select(
        "address",
        "token_address",
        F.col("delta").cast("decimal(38,0)").alias("_delta"),
        F.col("block_number").alias("_bn"),
    )
    prev_df = None
    if tables.wallets.current_snapshot() is not None:
        # bucket-pruned lookup: read only the state buckets this batch's
        # keys hash into — cycle cost scales with the delta, not the table
        touched = tables.wallets.touched_buckets(totals)
        candidate = tables.wallets.read(buckets=touched)
        if "balance" in candidate.columns:  # empty prune -> key-only schema
            prev_df = candidate
    if prev_df is not None:
        prev = prev_df.select(
            "address",
            "token_address",
            F.col("balance").cast("decimal(38,0)").alias("_prev"),
            F.col("at_block_number").alias("_pbn"),
        )
        totals = totals.join(prev, ["address", "token_address"], "left")
    else:
        totals = totals.withColumn("_prev", F.lit(None).cast("decimal(38,0)")).withColumn(
            "_pbn", F.lit(None).cast("long")
        )
    new_state = totals.select(
        "address",
        "token_address",
        (F.coalesce(F.col("_prev"), F.lit(0).cast("decimal(38,0)")) + F.col("_delta"))
        .cast("string")
        .alias("balance"),  # stringified like the reference sink (:124)
        F.greatest(F.col("_bn"), F.coalesce(F.col("_pbn"), F.lit(0)).cast("long")).alias(
            "at_block_number"
        ),
    )
    out.metrics["wallets"] = tables.wallets.merge(new_state, f"{batch_id}-wallets")
    return out


def stream_wallet_state(
    spark: SparkSession,
    deltas_dir: str,
    wallets: MergeTable,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> None:
    """Kappa counterpart of :func:`export_knowledge_graph`'s wallet
    accumulate: the SAME final wallet state, produced by Structured
    Streaming instead of batch read-modify-write.

    Pipeline: file-source tail over the delta log (address, token_address,
    delta STRING, block_number) → ``streaming_balances_exact``
    (applyInPandasWithState — cross-micro-batch cumulative balances in the
    state store, uint256-exact) → foreachBatch idempotent MERGE of each
    batch's emissions into the wallets table. Restart-safe end to end: the
    streaming checkpoint replays an interrupted micro-batch, and the
    re-merge is a batch-id no-op (exactly-once effective, the same
    guarantee as the batch Streamer).

    Latest-wins works because a key's emitted ``last_block`` is monotone
    (state keeps the max seen) and later snapshots win ties, so the final
    merged row per key is its last — fully accumulated — emission.
    """
    from ethereum_etl_spark.streaming.stateful import streaming_balances_exact

    deltas = (
        spark.readStream.schema(
            "address STRING, token_address STRING, delta STRING, block_number LONG"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(deltas_dir)
    )
    updates = streaming_balances_exact(deltas)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.select(
            "address",
            "token_address",
            F.col("balance"),
            F.col("last_block").alias("at_block_number"),
        )
        wallets.merge(batch, batch_id=f"kgs-{batch_id:012d}")

    q = (
        updates.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def wallet_map_view(tables: KnowledgeGraphTables) -> DataFrame:
    """The reference's wallet document shape: per-address {token: balance}
    map + at_block high-water mark (knowledge_graph_exporter.py:111-136),
    as a view over the normalized state table."""
    return (
        tables.wallets.read()
        .groupBy("address")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("token_address", "balance")))
            ).alias("balance"),
            F.max("at_block_number").alias("at_block_number"),
        )
    )
