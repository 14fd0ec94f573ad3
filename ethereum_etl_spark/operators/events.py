"""Generic ABI event decode — the reference's D2, as ABI→select codegen.

Reference: ``extract_event_from_log``
(/root/reference/ethereumetl/jobs/extractors/event_extractor.py:11-53) +
param ordering ``get_list_params_in_order``
(/root/reference/services/eth_event_service.py:15-23): for a subscribed
event ABI, take topics[1:] (indexed params first) followed by the 64-char
words of ``data`` (non-indexed params), zip with param names, decode ints
and addresses, stringify everything.

Instead of a per-row Python loop, the ABI is compiled **on the driver** into
a list of column expressions — one ``select`` per event type, fully
codegen'd. Dynamic schema (SURVEY.md §1.3): each ABI yields its own typed
columns additively; unknown ABIs can fall back to a map column.

``topic0`` is the REAL keccak-256 event-signature topic (the reference
precomputes it driver-side the same way, services/eth_event_service.py:6-12),
via the pure-Python Keccak in functions/keccak.py — decoded topics match
on-chain constants (e.g. Transfer = 0xddf252ad…). A sha256 stand-in remains
as ``topic0_sha256`` (any injective driver constant preserves the dataflow;
it was round 1's default and stays tested).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ethereum_etl_spark.functions.hex import (
    hex_to_dec_native,
    split_to_words,
    strip_0x,
    word_to_address,
)
from ethereum_etl_spark.functions.keccak import event_topic0


@dataclass(frozen=True)
class AbiInput:
    name: str
    type: str
    indexed: bool


@dataclass(frozen=True)
class EventAbi:
    name: str
    inputs: tuple[AbiInput, ...]
    save_name: str | None = None

    @property
    def signature(self) -> str:
        return f"{self.name}({','.join(i.type for i in self.inputs)})"

    @property
    def topic0(self) -> str:
        """keccak-256 event-signature topic — on-chain-identical."""
        return event_topic0(self.signature)

    @property
    def topic0_sha256(self) -> str:
        """Injective sha256 stand-in (legacy/fallback; same dataflow)."""
        return "0x" + hashlib.sha256(self.signature.encode()).hexdigest()

    def params_in_order(self) -> list[AbiInput]:
        """Indexed params first, then non-indexed — stable order
        (eth_event_service.py:15-23)."""
        return [i for i in self.inputs if i.indexed] + [i for i in self.inputs if not i.indexed]


def load_abi(abi_json: str | dict) -> EventAbi:
    """Parse an event ABI JSON (same shape as artifacts/event-abi/*.json)."""
    d = json.loads(abi_json) if isinstance(abi_json, str) else abi_json
    return EventAbi(
        name=d["name"],
        inputs=tuple(AbiInput(i["name"], i["type"], bool(i.get("indexed", False))) for i in d["inputs"]),
        save_name=d.get("saveName"),
    )


def _decode_word(word: Column, sol_type: str) -> Column:
    """Type-directed word decode (event_extractor.py:43-58): ints → exact
    decimal (stringified, as the reference stringifies all params),
    addresses → 0x+last-40, else raw word."""
    if sol_type.startswith(("uint", "int")):
        return hex_to_dec_native(word).cast("string")
    if sol_type == "address":
        return word_to_address(word)
    return F.lower(word)


def decode_events(logs: DataFrame, abi: EventAbi, topic0: str | None = None) -> DataFrame:
    """logs → decoded events for one ABI: fixed columns (event_type,
    contract_address, transaction_hash, log_index, block_number) + one
    string column per ABI input, indexed-first order.

    Malformed guard (F6): word count must equal len(inputs)
    (event_extractor.py:13-28).
    """
    t0 = topic0 or abi.topic0
    params = abi.params_in_order()
    words = F.concat(
        F.slice(F.col("topics"), 2, 1_000_000),  # drop topic0, keep indexed words
        split_to_words(F.col("data")),
    )
    # Word-count guard as pure length arithmetic (|topics|-1 indexed words +
    # floor(len(data)/64) data words) — keeps the higher-order transform()
    # out of the filter predicate, which Spark 4.1.2's standalone FilterExec
    # codegen miscompiles (silent interpreted fallback); see transfers.py.
    bare_len = F.length(strip_0x(F.col("data")))
    data_words = F.when(bare_len >= 64, F.floor(bare_len / 64)).otherwise(F.lit(0))
    df = (
        logs.filter(F.size("topics") > 0)
        .filter(F.element_at("topics", 1) == F.lit(t0))
        .filter((F.size("topics") - 1 + data_words) == F.lit(len(params)))
        .withColumn("_words", words)
    )
    cols = [
        F.lit(abi.name).alias("event_type"),
        F.lower(F.col("address")).alias("contract_address"),
        F.col("transaction_hash"),
        F.col("log_index"),
        F.col("block_number"),
    ]
    for i, p in enumerate(params):
        cols.append(_decode_word(F.element_at("_words", i + 1), p.type).alias(p.name))
    return df.select(*cols)


def decode_events_multi(logs: DataFrame, abis: list[EventAbi]) -> dict[str, DataFrame]:
    """One decoded DataFrame per subscribed ABI (the reference loops ABIs at
    export_subscriber_events_job.py:41-118). A single pass over the logs is
    preserved because each decode is a filter+select over the same scan —
    Catalyst reuses the cached/exchanged scan across the queries."""
    return {abi.save_name or abi.name: decode_events(logs, abi) for abi in abis}


def address_fields(abi: EventAbi) -> list[str]:
    """Names of address-typed inputs — wallet-extraction targets (D3,
    eth_event_service.py:26-31)."""
    return [i.name for i in abi.inputs if i.type == "address"]
