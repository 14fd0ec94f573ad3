"""Watermarked windowed rollups — late-data-aware streaming aggregation.

The reference has no event-time aggregation (its daily-token gate,
export_knowledge_graph_needed_common.py:183-198, is a driver-side
at-most-once-per-day check — rebuilt as the batch `daily_checkpoint_gate`
query). This module is the streaming-native generalization: tumbling /
sliding event-time windows over the change stream with a watermark bounding
how late an event may arrive and still be counted — the state-cleanup
contract that makes unbounded streams feasible (state per window is dropped
once the watermark passes, so memory is O(active windows), not O(stream)).

Works identically on a batch DataFrame (withWatermark is a no-op there), so
the same rollup definition serves backfill and tail — the lambda-free
kappa pattern.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "5 minutes",
    slide: str | None = None,
    watermark_delay: str = "10 minutes",
    keys: Sequence[str] = ("event_type",),
    value_col: str | None = "value",
) -> DataFrame:
    """Event-time windowed counts/sums with a late-data watermark.

    ``slide`` < ``window_duration`` gives sliding (overlapping) windows;
    default is tumbling. Sums are exact fixed-scale decimals (associative —
    safe to aggregate incrementally across micro-batches).
    """
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("total")
        )
    win = F.window(F.col(ts_col), window_duration, slide or window_duration)
    return (
        df.withWatermark(ts_col, watermark_delay)
        .groupBy(win.alias("win"), *[F.col(k) for k in keys])
        .agg(*aggs)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *[F.col(k) for k in keys],
            "n",
            *(["total"] if value_col is not None else []),
        )
    )


def session_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark_delay: str = "10 minutes",
    keys: Sequence[str] = ("user_id",),
    value_col: str | None = "value",
) -> DataFrame:
    """Event-time *session* windows: per key, events merge while each
    arrives within ``gap`` of the previous one (strictly less — a gap of
    exactly ``gap`` starts a new session); the emitted window is
    [first_ts, last_ts + gap).

    Built on ``F.session_window``, so in streaming mode Spark maintains and
    merges per-key session state and the watermark closes sessions whose
    end has passed — state is O(open sessions), not O(stream). On the batch
    path the same definition runs as a plain aggregation (kappa). This is
    the streaming counterpart of ``operators/sessions.sessionize`` (which
    additionally numbers sessions per key — a running count that needs a
    total order and is therefore batch/window territory; note its gap
    comparison is ``>`` where session_window's is ``>=``).

    Scale notes: one shuffle on ``keys``; session merge is per-key local
    state; skew bound is per-key open-session count. Decimal sums stay
    associative for incremental micro-batch aggregation.
    """
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("total")
        )
    return (
        df.withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("win"),
            *[F.col(k) for k in keys],
        )
        .agg(*aggs)
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            *[F.col(k) for k in keys],
            "n",
            *(["total"] if value_col is not None else []),
        )
    )
