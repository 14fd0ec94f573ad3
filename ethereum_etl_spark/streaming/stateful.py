"""Custom stateful streaming operator — running balances with
``applyInPandasWithState``.

Reference semantics: the wallet balance cache (A3/J1 —
services/wallet_services.py:11-59: per (address, token) prev-balance cache
updated as transfers stream in, TTL-expired after 86400 s). In batch mode
the rebuild uses a window cumsum (operators/balances.py); THIS module is the
Structured-Streaming-native form: state lives in Spark's state store per
group key, survives across micro-batches via the checkpoint, and expires by
processing-time timeout (the cache-TTL analog).

Kernel contract (GroupState API):
- groupBy(address, token_address) — state key = the reference's cache key
- state value = (balance, last_block)
- each micro-batch folds that group's deltas into the balance and emits one
  row per group with old/new balance — Arrow-batched, no per-row Python

(Spark 4 also ships transformWithStateInPandas; its state-server protocol
needs google.protobuf, which this container lacks, so the Arrow-native
GroupState API is used.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

OUTPUT_SCHEMA = (
    "address STRING, token_address STRING, old_balance DOUBLE, "
    "new_balance DOUBLE, last_block BIGINT, n_events BIGINT"
)
STATE_SCHEMA = "balance DOUBLE, last_block BIGINT"

CACHE_TTL_MS = 86_400_000  # the reference's 86400 s cache TTL (constant.py:47-48)


def _make_update_fn(ttl_ms: int | None):
    def _update_balances(key, pdfs, state):
        if state.hasTimedOut:
            # TTL expiry — the reference drops cache entries past
            # update_checkpoint (config/constant.py:47-48)
            state.remove()
            return
        address, token = key
        old_balance, last_block = state.get if state.exists else (0.0, -1)
        delta_sum, n, max_block = 0.0, 0, int(last_block)
        for pdf in pdfs:
            delta_sum += float(pdf["delta"].sum())
            n += len(pdf)
            if len(pdf):
                max_block = max(max_block, int(pdf["block_number"].max()))
        new_balance = float(old_balance) + delta_sum
        state.update((new_balance, max_block))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                "address": [address],
                "token_address": [token],
                "old_balance": [float(old_balance)],
                "new_balance": [new_balance],
                "last_block": [max_block],
                "n_events": [n],
            }
        )

    return _update_balances


EXACT_OUTPUT_SCHEMA = (
    "address STRING, token_address STRING, balance STRING, "
    "last_block BIGINT, n_events BIGINT"
)
EXACT_STATE_SCHEMA = "balance STRING, last_block BIGINT"


def _make_exact_update_fn(ttl_ms: int | None):
    def _update(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        address, token = key
        bal_str, last_block = state.get if state.exists else ("0", -1)
        bal, n, max_block = int(bal_str), 0, int(last_block)
        for pdf in pdfs:
            bal += sum(int(d) for d in pdf["delta"])
            n += len(pdf)
            if len(pdf):
                max_block = max(max_block, int(pdf["block_number"].max()))
        state.update((str(bal), max_block))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                "address": [address],
                "token_address": [token],
                "balance": [str(bal)],
                "last_block": [max_block],
                "n_events": [n],
            }
        )

    return _update


def streaming_balances_exact(deltas: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """Exact-integer (uint256-safe) streaming balances: state and deltas are
    decimal STRINGS folded with Python arbitrary-precision ints — the
    variant the knowledge-graph wallet state needs (token values reach
    2^256; DOUBLE state silently loses low bits above 2^53). Per-group
    summation is Python-side over Arrow batches, exactly like the batch
    path's uint256 escape hatch. Same GroupState contract as
    :func:`streaming_balances`; emits the cumulative balance per touched
    key per micro-batch."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return deltas.groupBy("address", "token_address").applyInPandasWithState(
        _make_exact_update_fn(ttl_ms),
        EXACT_OUTPUT_SCHEMA,
        EXACT_STATE_SCHEMA,
        "update",
        timeout,
    )


def streaming_balances(deltas: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """Streaming deltas (address, token_address, delta, block_number) ->
    per-micro-batch balance updates with cross-batch state.

    ``ttl_ms``: state TTL for continuous tail queries (the reference's
    86400 s cache TTL -> CACHE_TTL_MS). Leave None for availableNow /
    bounded drains: with a processing-time timeout configured, Spark keeps
    scheduling timeout-evaluation micro-batches and an availableNow query
    never terminates."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return deltas.groupBy("address", "token_address").applyInPandasWithState(
        _make_update_fn(ttl_ms),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        timeout,
    )
