"""Streamer — the micro-batch tail loop with exactly-once checkpointing.

Rebuild of the reference's Streamer (blockchainetl/streaming/streamer.py:
40-139 — SURVEY.md §2.9/§3.1): poll head → compute target (lag, batch cap)
→ export range → advance checkpoint. Differences by design:

- **Fail the batch, not the log line**: the reference swallows job errors
  and advances the checkpoint anyway (base_job.py:28-35 — at-least-once
  with holes). Here an exception aborts the cycle *before* the checkpoint
  write, so the range is retried next cycle.
- **Exactly-once effective**: the MERGE is idempotent per batch_id (derived
  from the range) and per merge key, so the crash window between merge
  commit and checkpoint write only produces a no-op re-merge — the
  reference's re-export-on-restart (streamer.py:102-106) with no duplicate
  effects.
- **Checkpoint conflict rule** (T2): passing ``start_seq`` when a checkpoint
  already exists is a hard error, exactly like ``--start-block`` vs
  last_synced_block.txt (streamer.py:55-58).
- **Graceful stop** (T6): ``request_stop()`` (wire it to SIGTERM in a real
  deployment, like the reference's graceful shutdown) lets the in-flight
  cycle finish — merge commit then checkpoint — and exits at the next loop
  boundary. The table is never left between commit and checkpoint except in
  the idempotent-re-merge crash window.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import SparkSession

from ethereum_etl_spark.plans.merge import MergeMetrics, MergeTable
from ethereum_etl_spark.plans.normalize import normalize_changes
from ethereum_etl_spark.sources.tail import TailSource


class Streamer:
    def __init__(
        self,
        spark: SparkSession,
        source: TailSource,
        table: MergeTable,
        checkpoint_dir: str,
        start_seq: int | None = None,
        poll_seconds: float = 2.0,
    ):
        self.spark = spark
        self.source = source
        self.table = table
        self.checkpoint_dir = checkpoint_dir
        self.poll_seconds = poll_seconds
        self._stop_requested = False
        os.makedirs(checkpoint_dir, exist_ok=True)
        ckpt = self._checkpoint_path()
        legacy = os.path.join(checkpoint_dir, "last_synced_block.txt")
        if start_seq is not None and (os.path.exists(ckpt) or os.path.exists(legacy)):
            raise ValueError(
                f"start_seq={start_seq} conflicts with existing checkpoint in "
                f"{checkpoint_dir}; delete it to force a restart "
                "(reference rule: streamer.py:55-58)"
            )
        if start_seq is not None:
            self._write_last_synced(start_seq - 1)

    # ---------------- checkpoint ----------------

    def _checkpoint_path(self) -> str:
        return os.path.join(self.checkpoint_dir, "last_synced_seq.json")

    def last_synced(self) -> int:
        p = self._checkpoint_path()
        if not os.path.exists(p):
            # migration shim: accept the reference's checkpoint format
            # verbatim (a bare integer in last_synced_block.txt,
            # streamer.py:124-134) so a reference user switches over
            # without re-syncing; the next advance upgrades it to JSON
            legacy = os.path.join(self.checkpoint_dir, "last_synced_block.txt")
            if os.path.exists(legacy):
                with open(legacy) as f:
                    return int(f.read().strip())
            return -1
        with open(p) as f:
            return int(json.load(f)["last_synced_seq"])

    def _write_last_synced(self, seq: int) -> None:
        p = self._checkpoint_path()
        tmp = p + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"last_synced_seq": seq, "ts": time.time()}, f)
        os.replace(tmp, p)  # atomic, like the manifest pointer

    # ---------------- sync cycles ----------------

    def run_cycle(self) -> MergeMetrics | None:
        """One sync cycle: poll head, merge the next range, advance the
        checkpoint. Returns None when nothing new is visible (idle)."""
        last = self.last_synced()
        rng = self.source.next_range(last)
        if rng is None:
            return None
        start, end = rng
        batch = normalize_changes(self.source.range_df(start, end))
        metrics = self.table.merge(batch, batch_id=f"stream-{start:012d}-{end:012d}")
        # checkpoint advances only after a successful, committed merge
        self._write_last_synced(end)
        return metrics

    def request_stop(self) -> None:
        """Graceful stop (T6): the current cycle completes (merge +
        checkpoint), then the loop exits. Safe from any thread / a signal
        handler — it only flips a flag read at loop boundaries."""
        self._stop_requested = True

    def run_until_head(self, max_cycles: int | None = None) -> list[MergeMetrics]:
        """Drain everything currently visible (availableNow trigger analog)."""
        out: list[MergeMetrics] = []
        while (max_cycles is None or len(out) < max_cycles) and not self._stop_requested:
            m = self.run_cycle()
            if m is None:
                break
            out.append(m)
        return out

    def stream(self, max_seconds: float, end_seq: int | None = None) -> list[MergeMetrics]:
        """Tail loop: drain, then sleep ``poll_seconds`` when idle
        (streamer.py:73-87). Stops after ``max_seconds``, once
        ``end_seq`` is synced, or when a graceful stop is requested."""
        deadline = time.time() + max_seconds
        out: list[MergeMetrics] = []
        while time.time() < deadline and not self._stop_requested:
            m = self.run_cycle()
            if m is not None:
                out.append(m)
            elif end_seq is not None and self.last_synced() >= end_seq:
                break
            else:
                time.sleep(min(self.poll_seconds, max(deadline - time.time(), 0)))
            if end_seq is not None and self.last_synced() >= end_seq:
                break
        return out
