"""Trace flatten — the reference's P6: recursive call-tree -> rows.

Reference: ``geth_trace_to_traces``
(/root/reference/ethereumetl/mappers/trace_mapper.py:127-170) walks a geth
``callTracer`` JSON tree recursively, emitting one row per call frame with
the accumulated ``trace_address`` path and per-type field routing
(call/create/suicide/reward, trace_mapper.py:30-80); genesis/daofork
synthetic traces at :97-125.

Spark-first shape: the tree walk is per-row local compute with no cross-row
dependency, so it runs as an Arrow-batched ``mapInPandas`` kernel (the
sanctioned escape hatch for operators Spark's relational algebra lacks) —
one pass, no shuffle, output size = total frames. Everything downstream
(status derivation, per-type projections) is declarative column work.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRACE_SCHEMA = (
    "block_number BIGINT, transaction_hash STRING, trace_address STRING, "
    "depth INT, subtraces INT, trace_type STRING, from_address STRING, "
    "to_address STRING, value_hex STRING, gas_hex STRING, error STRING"
)


def _walk(node: dict, path: list[int], out: list[dict], block_number, tx_hash) -> None:
    calls = node.get("calls") or []
    out.append(
        {
            "block_number": block_number,
            "transaction_hash": tx_hash,
            "trace_address": ",".join(str(p) for p in path),
            "depth": len(path),
            "subtraces": len(calls),
            "trace_type": (node.get("type") or "call").lower(),
            "from_address": (node.get("from") or "").lower() or None,
            "to_address": (node.get("to") or "").lower() or None,
            "value_hex": node.get("value"),
            "gas_hex": node.get("gas"),
            "error": node.get("error"),
        }
    )
    for i, child in enumerate(calls):
        _walk(child, path + [i], out, block_number, tx_hash)


def flatten_geth_traces(
    traces: DataFrame,
    trace_col: str = "trace_json",
    block_col: str = "block_number",
    tx_col: str = "transaction_hash",
) -> DataFrame:
    """(block_number, transaction_hash, trace_json) -> one row per call frame
    with the accumulated trace_address path (trace_mapper.py:127-170)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "block_number", "transaction_hash", "trace_address", "depth",
            "subtraces", "trace_type", "from_address", "to_address",
            "value_hex", "gas_hex", "error",
        ]
        for pdf in batches:
            rows: list[dict] = []
            for bn, tx, tj in zip(pdf[block_col], pdf[tx_col], pdf[trace_col]):
                if tj is None:
                    continue
                try:
                    root = json.loads(tj)
                except (TypeError, ValueError):
                    continue
                _walk(root, [], rows, bn, tx)
            yield pd.DataFrame(rows, columns=cols)

    return traces.select(block_col, tx_col, trace_col).mapInPandas(
        kernel, TRACE_SCHEMA
    )


def route_trace_fields(flat: DataFrame) -> DataFrame:
    """Per-type field routing (trace_mapper.py:30-80): call keeps from/to,
    create maps `to` to the created contract, suicide maps from->self,
    to->refund address. Declarative, post-flatten."""
    t = F.col("trace_type")
    return flat.select(
        "block_number",
        "transaction_hash",
        "trace_address",
        "depth",
        "subtraces",
        "trace_type",
        F.when(t.isin("call", "create", "suicide"), F.col("from_address")).alias("from_address"),
        F.when(t == "suicide", F.col("to_address"))
        .when(t.isin("call", "create"), F.col("to_address"))
        .alias("to_address"),
        "value_hex",
        "error",
        (F.col("error").isNull()).alias("status_ok"),
    )


def genesis_traces(spark: SparkSession, allocs: list[tuple[str, str]]) -> DataFrame:
    """Synthetic genesis reward rows (trace_mapper.py:97-111): one reward
    trace per genesis allocation (address, value_hex) at block 0."""
    rows = [
        (0, None, "", 0, 0, "genesis", None, addr.lower(), value_hex, None, None)
        for addr, value_hex in allocs
    ]
    return spark.createDataFrame(rows, TRACE_SCHEMA)
