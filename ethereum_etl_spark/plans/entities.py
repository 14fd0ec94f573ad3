"""Entity export pipeline — the reference's per-entity mappers + exporters
(P1-P4) with the exporter field lists reproduced verbatim.

Reference field lists (a user of the reference gets the same columns in the
same order):
- BLOCK_FIELDS  blocks_and_transactions_item_exporter.py:26-45
- TX_FIELDS     blocks_and_transactions_item_exporter.py:47-60
- RECEIPT_FIELDS receipts_and_logs_item_exporter.py:26-36
- LOG_FIELDS    receipts_and_logs_item_exporter.py:38-47

Mapper semantics (block_mapper.py:36-88, transaction_mapper.py:29-60,
receipt_mapper.py:58-70, receipt_log_mapper.py:30-80): camelCase hex-string
fields -> snake_case typed columns; hex->dec on numeric fields (exact
DECIMAL(38,0) for unbounded ones); lowercase addresses; nested
block->transactions flattened by explode with `block_timestamp` inherited
from the parent row — free here, no join, because the parent columns ride
along the explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ethereum_etl_spark.functions.hex import (
    hex_to_dec_long,
    hex_to_dec_native,
    normalize_address,
)

BLOCK_FIELDS = [
    "number", "hash", "parent_hash", "nonce", "sha3_uncles", "logs_bloom",
    "transactions_root", "state_root", "receipts_root", "miner", "difficulty",
    "total_difficulty", "size", "extra_data", "gas_limit", "gas_used",
    "timestamp", "transaction_count",
]

TX_FIELDS = [
    "hash", "nonce", "block_hash", "block_number", "transaction_index",
    "from_address", "to_address", "value", "gas", "gas_price", "input",
    "block_timestamp",
]

RECEIPT_FIELDS = [
    "transaction_hash", "transaction_index", "block_hash", "block_number",
    "cumulative_gas_used", "gas_used", "contract_address", "root", "status",
]

LOG_FIELDS = [
    "log_index", "transaction_hash", "transaction_index", "block_hash",
    "block_number", "address", "data", "topics",
]


def export_blocks(raw_blocks: DataFrame) -> DataFrame:
    """Raw JSON-RPC-shaped block rows -> the reference's block export.

    Input columns (camelCase hex strings, as eth_getBlockByNumber returns):
    number, hash, parentHash, nonce, sha3Uncles, logsBloom, transactionsRoot,
    stateRoot, receiptsRoot, miner, difficulty, totalDifficulty, size,
    extraData, gasLimit, gasUsed, timestamp, transactions (array<struct>).
    """
    return raw_blocks.select(
        hex_to_dec_long(F.col("number")).alias("number"),
        F.col("hash"),
        F.col("parentHash").alias("parent_hash"),
        F.col("nonce"),
        F.col("sha3Uncles").alias("sha3_uncles"),
        F.col("logsBloom").alias("logs_bloom"),
        F.col("transactionsRoot").alias("transactions_root"),
        F.col("stateRoot").alias("state_root"),
        F.col("receiptsRoot").alias("receipts_root"),
        normalize_address(F.col("miner")).alias("miner"),
        hex_to_dec_native(F.col("difficulty")).alias("difficulty"),
        hex_to_dec_native(F.col("totalDifficulty")).alias("total_difficulty"),
        hex_to_dec_long(F.col("size")).alias("size"),
        F.col("extraData").alias("extra_data"),
        hex_to_dec_long(F.col("gasLimit")).alias("gas_limit"),
        hex_to_dec_long(F.col("gasUsed")).alias("gas_used"),
        hex_to_dec_long(F.col("timestamp")).alias("timestamp"),
        F.size(F.col("transactions")).cast("long").alias("transaction_count"),
    )


def export_transactions(raw_blocks: DataFrame) -> DataFrame:
    """Explode nested transactions; block_timestamp inherited from the parent
    row (transaction_mapper.py:40-41 sets it from the enclosing block)."""
    tx = raw_blocks.select(
        F.col("hash").alias("_block_hash"),
        hex_to_dec_long(F.col("number")).alias("_block_number"),
        hex_to_dec_long(F.col("timestamp")).alias("_block_timestamp"),
        F.explode(F.col("transactions")).alias("t"),
    )
    return tx.select(
        F.col("t.hash").alias("hash"),
        hex_to_dec_long(F.col("t.nonce")).alias("nonce"),
        F.col("_block_hash").alias("block_hash"),
        F.col("_block_number").alias("block_number"),
        hex_to_dec_long(F.col("t.transactionIndex")).alias("transaction_index"),
        normalize_address(F.col("t.from")).alias("from_address"),
        normalize_address(F.col("t.to")).alias("to_address"),
        hex_to_dec_native(F.col("t.value")).alias("value"),
        hex_to_dec_long(F.col("t.gas")).alias("gas"),
        hex_to_dec_long(F.col("t.gasPrice")).alias("gas_price"),
        F.col("t.input").alias("input"),
        F.col("_block_timestamp").alias("block_timestamp"),
    )


def export_receipts(raw_receipts: DataFrame) -> DataFrame:
    """Receipt projection (receipt_mapper.py:58-70)."""
    return raw_receipts.select(
        F.col("transactionHash").alias("transaction_hash"),
        hex_to_dec_long(F.col("transactionIndex")).alias("transaction_index"),
        F.col("blockHash").alias("block_hash"),
        hex_to_dec_long(F.col("blockNumber")).alias("block_number"),
        hex_to_dec_long(F.col("cumulativeGasUsed")).alias("cumulative_gas_used"),
        hex_to_dec_long(F.col("gasUsed")).alias("gas_used"),
        normalize_address(F.col("contractAddress")).alias("contract_address"),
        F.col("root"),
        hex_to_dec_long(F.col("status")).alias("status"),
    )


def export_logs(raw_logs: DataFrame) -> DataFrame:
    """Log projection (receipt_log_mapper.py:30-42); topics stays an array —
    the CSV sink comma-joins it (sinks/exporters.py)."""
    return raw_logs.select(
        hex_to_dec_long(F.col("logIndex")).alias("log_index"),
        F.col("transactionHash").alias("transaction_hash"),
        hex_to_dec_long(F.col("transactionIndex")).alias("transaction_index"),
        F.col("blockHash").alias("block_hash"),
        hex_to_dec_long(F.col("blockNumber")).alias("block_number"),
        normalize_address(F.col("address")).alias("address"),
        F.col("data"),
        F.col("topics"),
    )


TOKEN_FIELDS = [
    "address", "symbol", "name", "decimals", "total_supply", "block_number",
    # extra durable column vs the reference list: hex_to_dec_native caps at
    # DECIMAL(38,0) (~16^31), so legal uint256 supplies above that would
    # otherwise export NULL with the value lost; the canonical hex string is
    # kept as the lossless truth (the reference stringifies the unbounded
    # int at the sink, knowledge_graph_exporter.py:93-97)
    "total_supply_hex",
]


def export_tokens(raw_tokens: DataFrame) -> DataFrame:
    """Token metadata export (tokens_item_exporter.py:26-33; job
    export_tokens_job.py:53-90): lowercase address, NUL-stripped
    user-provided symbol/name (`clean_user_provided_content`,
    export_tokens_job.py:80-90), exact-decimal total_supply kept as the
    canonical string (the reference stringifies it at the sink,
    knowledge_graph_exporter.py:93-97)."""
    from ethereum_etl_spark.functions.text import clean_content

    return raw_tokens.select(
        normalize_address(F.col("address")).alias("address"),
        clean_content(F.col("symbol")).alias("symbol"),
        clean_content(F.col("name")).alias("name"),
        hex_to_dec_long(F.col("decimals")).alias("decimals"),
        hex_to_dec_native(F.col("totalSupply")).alias("total_supply"),
        F.col("block_number"),
        F.lower(F.col("totalSupply")).alias("total_supply_hex"),
    )


TRACE_EXPORT_FIELDS = [
    "block_number", "transaction_hash", "transaction_index", "from_address",
    "to_address", "value", "input", "output", "trace_type", "call_type",
    "reward_type", "gas", "gas_used", "subtraces", "trace_address", "error",
    "status", "trace_id",
]

CONTRACT_FIELDS = [
    "address", "bytecode", "function_sighashes", "is_erc20", "is_erc721",
    "block_number",
]


def export_traces(flat: DataFrame) -> DataFrame:
    """Flattened call frames -> the reference's trace export
    (traces_item_exporter.py FIELDS_TO_EXPORT; mapper semantics at
    trace_mapper.py:127-192): selfdestruct renamed to suicide, the call
    family (call/callcode/delegatecall/staticcall) folds into
    trace_type='call' with call_type carrying the specific opcode; value is
    exact-decimal, gas fields 64-bit; status is set only by the synthetic
    genesis/daofork constructors (:107,:123 — tx frames export NULL, like
    the reference fork, which has no status calculator); trace_id likewise
    NULL (domain/trace.py:43)."""
    t = F.col("trace_type")
    call_family = t.isin("call", "callcode", "delegatecall", "staticcall")
    tx_index = (
        F.col("transaction_index")
        if "transaction_index" in flat.columns
        else F.lit(None).cast("long")
    )
    return flat.select(
        F.col("block_number"),
        F.col("transaction_hash"),
        tx_index.alias("transaction_index"),
        F.col("from_address"),
        F.col("to_address"),
        hex_to_dec_native(F.col("value_hex")).alias("value"),
        F.col("input"),
        F.col("output"),
        F.when(t == "selfdestruct", F.lit("suicide"))
        .when(call_family, F.lit("call"))
        .otherwise(t)
        .alias("trace_type"),
        F.when(call_family, t).alias("call_type"),
        F.lit(None).cast("string").alias("reward_type"),
        hex_to_dec_long(F.col("gas_hex")).alias("gas"),
        hex_to_dec_long(F.col("gas_used_hex")).alias("gas_used"),
        F.col("subtraces"),
        F.col("trace_address"),
        F.col("error"),
        F.when(t.isin("genesis", "daofork"), F.lit(1)).cast("int").alias("status"),
        F.lit(None).cast("string").alias("trace_id"),
    )


def export_contracts(classified: DataFrame) -> DataFrame:
    """Classified contracts -> the reference's contract export
    (contracts_item_exporter.py FIELDS_TO_EXPORT; contract_mapper.py:33-41):
    lowercase address, raw bytecode, sighash list, ERC flags."""
    return classified.select(
        normalize_address(F.col("address")).alias("address"),
        F.col("bytecode"),
        F.col("function_sighashes"),
        F.col("is_erc20"),
        F.col("is_erc721"),
        F.col("block_number"),
    )


def native_transfers(transactions: DataFrame) -> DataFrame:
    """F5: plain value transfers — `input == '0x'`
    (export_blocks_job.py:162)."""
    return transactions.filter(F.col("input") == "0x")
