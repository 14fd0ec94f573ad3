"""ERC-20/721 Transfer extraction — the reference's D1 decoder, declarative.

Reference: ``extract_transfer_from_log``
(/root/reference/ethereumetl/jobs/extractors/token_transfer_extractor.py:36-63):
keep logs whose topic0 is the Transfer event signature, concatenate topics
with the 64-char words of ``data``, require exactly 4 words (F6 malformed
guard, :48-51), then decode (token, from, to, value).

Here the whole decoder is **one filter + one select of column expressions**
— no UDF in the hot path; only the exact uint256 value decode uses the
Arrow-batched pandas UDF. Catalyst pushes the topic0 equality into the scan
(the analog of the reference pushing it into eth_getLogs server-side,
export_token_transfers_job.py:107-111).

Input shape (logs): address string, topics array<string>, data string,
transaction_hash string, log_index long, block_number long.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ethereum_etl_spark.functions.hex import (
    TRANSFER_EVENT_TOPIC,
    hex_to_dec_native,
    split_to_words,
    strip_0x,
    word_to_address,
)


def transfer_words(topics: Column, data: Column) -> Column:
    """topics ++ split_to_words(data) — the decode word list (:43-46)."""
    return F.concat(topics, split_to_words(data))


def extract_token_transfers(
    logs: DataFrame,
    token_filter: DataFrame | list[str] | None = None,
    exact_value: bool = True,
) -> DataFrame:
    """logs → token_transfers (token_address, from_address, to_address,
    value, value_hex, transaction_hash, log_index, block_number).

    ``token_filter``: optional IN-list / dim of contract addresses (F3);
    a Python list becomes an ``isin`` predicate (pushed down), a DataFrame
    becomes a broadcast left-semi join — both avoid shuffling the fact side.
    """
    words = transfer_words(F.col("topics"), F.col("data"))
    # F6 word-count guard as pure length arithmetic: |words| = |topics| +
    # floor(len(data)/64). Keeping the higher-order transform() OUT of the
    # filter predicate matters twice over: (a) Spark 4.1.2's standalone
    # FilterExec predicate codegen miscompiles HOF subexpressions ("isNull_N
    # is not an rvalue" -> silent interpreted fallback on every row), and
    # (b) a plain length comparison stays pushdown-eligible. The word array
    # itself is only evaluated in the projection, after the guard.
    bare_len = F.length(strip_0x(F.col("data")))
    data_words = F.when(bare_len >= 64, F.floor(bare_len / 64)).otherwise(F.lit(0))
    out = (
        logs
        # F1 topic filter + F6 malformed guards (empty topics; word count != 4)
        .filter(F.size("topics") > 0)
        .filter(F.element_at("topics", 1) == F.lit(TRANSFER_EVENT_TOPIC))
        .filter((F.size("topics") + data_words) == 4)
        .withColumn("_words", words)
        .select(
            F.lower(F.col("address")).alias("token_address"),
            word_to_address(F.element_at("_words", 2)).alias("from_address"),
            word_to_address(F.element_at("_words", 3)).alias("to_address"),
            F.lower(F.element_at("_words", 4)).alias("value_hex"),
            F.col("transaction_hash"),
            F.col("log_index"),
            F.col("block_number"),
        )
    )
    if exact_value:
        out = out.withColumn("value", hex_to_dec_native(F.col("value_hex")))
    else:  # 64-bit fast path when the caller knows values are small
        out = out.withColumn("value", F.conv(F.regexp_replace("value_hex", "^0x", ""), 16, 10).cast("decimal(38,0)"))

    if token_filter is not None:
        if isinstance(token_filter, list):
            out = out.filter(F.col("token_address").isin([t.lower() for t in token_filter]))
        else:
            dim = token_filter.select(F.lower(F.col(token_filter.columns[0])).alias("token_address"))
            out = out.join(F.broadcast(dim), "token_address", "left_semi")
    return out
