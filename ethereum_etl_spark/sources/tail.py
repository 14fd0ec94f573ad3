"""TailSource — chain-head polling over the change-event log.

Reference semantics rebuilt (SURVEY.md §2.9 T1-T4):
- head poll      `get_current_block_number()` (eth_knowledge_graph_streamer_adapter.py:81-82)
                 → `SELECT max(seq)` on the log (a metadata-only parquet
                 statistics read; on Iceberg it's a snapshot-summary lookup)
- reorg lag      `target = head - lag` (streamer.py:110-111) — withhold the
                 newest `lag` events until they settle
- batch cap      `target = min(target, last + batch_size)` (streamer.py:112)
- offset math    next range is `(last_synced + 1, target)`, empty when the
                 head hasn't advanced
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class TailSource:
    def __init__(
        self,
        spark: SparkSession,
        source: str | DataFrame,
        lag: int = 0,
        batch_size: int = 100_000,
    ):
        self.spark = spark
        self._source = source
        self.lag = lag
        self.batch_size = batch_size

    def df(self) -> DataFrame:
        if isinstance(self._source, str):
            return self.spark.read.parquet(self._source)
        return self._source

    def head_seq(self) -> int:
        """Current head of the log (max seq). Parquet answers this from
        footer statistics; Iceberg from the snapshot summary."""
        row = self.df().select(F.max("seq")).first()
        return -1 if row[0] is None else int(row[0])

    def next_range(self, last_synced: int) -> tuple[int, int] | None:
        """(start, end) of the next micro-batch after ``last_synced``,
        honoring lag and batch cap; None when nothing new is visible."""
        target = self.head_seq() - self.lag
        target = min(target, last_synced + self.batch_size)
        if target <= last_synced:
            return None
        return last_synced + 1, target

    def range_df(self, start: int, end: int) -> DataFrame:
        """Scan of one micro-batch — the predicate is pushed into the parquet
        reader (file/row-group pruning on the seq statistics)."""
        return self.df().filter((F.col("seq") >= start) & (F.col("seq") <= end))
