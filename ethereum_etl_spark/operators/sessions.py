"""Gap-based sessionization over event streams.

Reference parity: the reference pipeline groups an entity's change events
into bursts for downstream rollups (SURVEY.md §2 A5/J5 family — the
day-bucket gates in ethereumetl's streamer batching); this operator is the
general form: split each key's event sequence wherever the inter-event gap
exceeds a threshold, then aggregate per burst. It is also the standard
event-analytics / training-data primitive (conversation turns, editing
sessions, crawl bursts).

Determinism (oracle-portable): all time arithmetic is exact integer
microseconds (``unix_micros`` here, ``epoch_us(ts)::BIGINT`` in DuckDB —
both read the parquet TIMESTAMP's native micros, no float, no rounding),
ordering is made total with an explicit tiebreak column, and the running
session counter uses an explicit ROWS frame.

Scale notes (100 TB): exactly one shuffle on the session key for the two
windows (lag + running sum share the same WindowSpec, so Catalyst computes
both in a single Window node over one sort); the per-session aggregate is
a groupBy on (key, session_seq) with map-side partial aggregation. No
global sort, no driver loop, no UDF — the whole plan is whole-stage
codegen. Skew bound: a key's cost is its own event count; pathological
single-key streams should pre-split by a coarse time bucket upstream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Assign a per-key 1-based ``session_seq`` to every event: a new
    session starts at the first event and whenever the gap to the previous
    event (same key, (ts, tiebreak) order) exceeds ``gap_seconds``.

    Adds ``ts_us`` (exact integer micros) and ``session_seq``; keeps all
    input columns.
    """
    gap_us = int(gap_seconds) * 1_000_000
    w = Window.partitionBy(key_col).orderBy("ts_us", *tiebreak)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("ts_us").over(w)
    is_new = F.when(
        prev.isNull() | (F.col("ts_us") - prev > F.lit(gap_us)), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        # parquet TIMESTAMP reads as TIMESTAMP_NTZ; the session TZ is pinned
        # UTC, so the NTZ->TZ cast is a no-op reinterpretation and the micros
        # equal DuckDB's naive epoch_us over the same file.
        df.withColumn("ts_us", F.unix_micros(F.col(ts_col).cast("timestamp")))
        .withColumn("session_seq", F.sum(is_new).over(run))
    )


def session_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak: Sequence[str] = ("event_id",),
    agg_cols: Sequence = (),
) -> DataFrame:
    """One row per (key, session): start/end micros, event count, plus any
    caller aggregates (pass pre-aliased Column aggs via ``agg_cols``)."""
    s = sessionize(df, key_col, ts_col, gap_seconds, tiebreak)
    return s.groupBy(key_col, "session_seq").agg(
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        F.count("*").alias("n_events"),
        *agg_cols,
    )
