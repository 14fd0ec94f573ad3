"""MergeTable — an idempotent, key-bucketed MERGE INTO sink on parquet.

This is the rebuild of the reference's Mongo knowledge-graph upsert sink
(knowledge_graph_exporter.py:32-143 + mongo_db.py:13-124 — SURVEY.md §2.8 K5)
and its last_synced_block checkpoint commit (streamer.py:102-134, K6), as a
lakehouse table:

- **Key-bucketed layout**: rows live in ``n_buckets`` hash buckets of the
  merge key (xxhash64 → pmod), so a MERGE only rewrites the buckets the
  batch touches — merge cost scales with the *delta*, not the table. This
  is Iceberg's ``bucket(N, key)`` partition transform; on a real cluster the
  same code targets Iceberg ``MERGE INTO`` and a storage-partitioned join
  removes the union shuffle entirely. (No Iceberg runtime jar ships in this
  sandbox, so the snapshot/commit protocol is implemented here directly.)

- **Snapshot isolation + atomic commit**: every merge writes new immutable
  parquet files, then a new snapshot manifest, then atomically swaps the
  ``manifest.json`` pointer (``os.replace``). A crash at any point leaves
  the previous snapshot intact — readers never see a partial merge.

- **Exactly-once**: each merge carries a ``batch_id``; committed ids are
  recorded in the snapshot, and re-merging a committed batch is a no-op.
  Combined with replay-idempotent keys this upgrades the reference's
  at-least-once checkpointing (re-export after crash, streamer.py:102-106)
  to exactly-once *effective* semantics.

- **Additive schema evolution** (reference rule, SURVEY.md §1.3): new
  columns union in by name; old rows read as NULL; nothing is rewritten.

- **Latest-wins resolution**: within a merge key, the row with the highest
  ``order_col`` (seq) wins — the CDC upsert semantic of mongo_db.py:72-83
  ``replace_one``.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

class CommitConflict(RuntimeError):
    """Another writer committed to this table after the current operation
    read its base snapshot. The losing writer must re-read the table state
    and redo its merge — blindly retrying the commit would silently drop
    the other writer's changes (the lost-update anomaly this check exists
    to prevent). Single-writer-per-table is the supported deployment (one
    Streamer owns a table); this turns accidental concurrent writers from
    silent corruption into a loud error — Iceberg's optimistic-concurrency
    commit semantic."""


_BUCKET_COL = "__bucket"
_IS_NEW_COL = "__is_new"
_RN_COL = "__rn"
_SNAP_COL = "__snap"


@dataclass
class MergeMetrics:
    """Per-merge lineage record (the A6 analog — SURVEY.md §2.6)."""

    batch_id: str
    snapshot_id: int
    rows_in: int
    rows_after_dedup: int
    buckets_touched: int
    n_buckets: int
    seconds: float
    noop: bool = False
    extra: dict = field(default_factory=dict)

    def to_dict(self) -> dict:
        return {
            "batch_id": self.batch_id,
            "snapshot_id": self.snapshot_id,
            "rows_in": self.rows_in,
            "rows_after_dedup": self.rows_after_dedup,
            "buckets_touched": self.buckets_touched,
            "n_buckets": self.n_buckets,
            "seconds": round(self.seconds, 4),
            "noop": self.noop,
            **self.extra,
        }


class MergeTable:
    """A parquet-backed upsert table with snapshot manifests.

    Layout::

        root/
          manifest.json            -> {"snapshot": <id>}   (atomic pointer)
          snapshots/<id>.json      -> immutable snapshot manifest
          data/s<id>/b=<k>/*.parquet
          lineage.jsonl            -> one MergeMetrics line per commit
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        merge_keys: Sequence[str] = ("repo", "path", "commit"),
        order_col: str = "seq",
        n_buckets: int = 32,
        mode: str = "cow",
        compact_threshold: int = 8,
        merge_salts: int = 1,
        auto_expire_keep: int | None = None,
        delete_where: str | None = None,
    ):
        """``mode``:

        - ``"cow"`` (copy-on-write): each merge rewrites the touched buckets
          with winners resolved — reads are raw scans. Best for bulk replay.
        - ``"mor"`` (merge-on-read): each merge APPENDS a delta file per
          touched bucket (merge cost O(batch), independent of table size —
          the Iceberg MOR pattern); winners are resolved at read time, and
          buckets holding more than ``compact_threshold`` files are
          compacted inside the next merge's commit. Best for micro-batch
          streaming where merge-apply latency is the headline metric.

        ``merge_salts``: sub-partition count for the merge-apply window (the
        north rule's salted repartitioning before merge-apply). The winner
        sort's parallelism is otherwise capped at ``n_buckets`` — at 100 TB
        with 32 buckets that is ~3 TB per sort partition. The salt is a
        *key-determined* hash (all rows of a merge key share a salt), so the
        per-key window stays correct while the sort fans out to
        ``n_buckets * merge_salts`` partitions. Sizing rule: buckets*salts ≈
        cluster cores * k. Default 1 = off.

        ``auto_expire_keep``: when set, every commit is followed by
        ``expire_snapshots(keep_last=auto_expire_keep)`` — the bounded-disk
        mode for long-running streams (a micro-batch stream otherwise
        accumulates one superseded copy of every touched bucket per merge).

        ``delete_where``: a SQL boolean over the row marking it a CDC
        DELETE (binlog/WAL ``op = 'd'`` semantics), e.g. ``"op = 'd'"``.
        Tombstones take part in latest-wins resolution and are PERSISTED
        (a late-replayed pre-delete row must still lose to the tombstone —
        the reason Iceberg MOR keeps delete files); ``read()`` filters
        them out of the visible state. The predicate is evaluated
        null-safely, so pre-evolution rows without the op column (read as
        NULL under additive schema evolution) are kept, not dropped.
        """
        if mode not in ("cow", "mor"):
            raise ValueError(mode)
        if merge_salts < 1:
            raise ValueError("merge_salts must be >= 1")
        self.spark = spark
        self.root = root
        self.merge_keys = list(merge_keys)
        self.order_col = order_col
        self.n_buckets = n_buckets
        self.mode = mode
        self.compact_threshold = compact_threshold
        self.merge_salts = merge_salts
        if auto_expire_keep is not None and auto_expire_keep < 1:
            raise ValueError("auto_expire_keep must be >= 1")
        self.auto_expire_keep = auto_expire_keep
        self.delete_where = delete_where
        os.makedirs(os.path.join(root, "snapshots"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # ---------------- snapshot plumbing ----------------

    @staticmethod
    def _attempt_token() -> str:
        """Per-attempt data-dir suffix: two writers racing the same next_id
        can both write files, but never into the same directory — the
        commit CAS then rejects the loser, whose orphan dir is reclaimed by
        ``expire_snapshots`` (it is referenced by no retained snapshot)."""
        return uuid.uuid4().hex[:6]

    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def current_snapshot(self) -> dict | None:
        mp = self._manifest_path()
        if not os.path.exists(mp):
            return None
        with open(mp) as f:
            pointer = json.load(f)
        with open(os.path.join(self.root, "snapshots", f"{pointer['snapshot']}.json")) as f:
            return json.load(f)

    def snapshot_at(self, snapshot_id: int) -> dict:
        """Manifest of a specific snapshot — raises if it never existed or
        was reclaimed by ``expire_snapshots`` (time-travel horizon)."""
        spath = os.path.join(self.root, "snapshots", f"{snapshot_id}.json")
        if not os.path.exists(spath):
            raise ValueError(
                f"snapshot {snapshot_id} does not exist or has been expired "
                f"(expire_snapshots bounds the time-travel horizon)"
            )
        with open(spath) as f:
            return json.load(f)

    def history(self) -> list[dict]:
        """Retained snapshots, oldest first — the audit/observability view
        (Iceberg's ``snapshots`` metadata table): id, parent, batch count,
        file count, and whether it is the current pointer. Time-travel and
        ``changes_since`` cursors are valid exactly for the ids listed."""
        sdir = os.path.join(self.root, "snapshots")
        cur = self.current_snapshot()
        out = []
        for i in sorted(
            int(f[:-5]) for f in os.listdir(sdir) if f.endswith(".json")
        ):
            with open(os.path.join(sdir, f"{i}.json")) as f:
                s = json.load(f)
            out.append({
                "id": s["id"],
                "parent": s.get("parent"),
                "n_batches": len(s.get("committed_batches", [])),
                "n_files": sum(len(v) for v in s["buckets"].values()),
                "is_current": bool(cur) and s["id"] == cur["id"],
            })
        return out

    def committed_batches(self) -> set[str]:
        snap = self.current_snapshot()
        return set(snap["committed_batches"]) if snap else set()

    def _commit(self, snapshot: dict) -> None:
        """Write the snapshot manifest, then CAS the pointer: the swap only
        happens if the pointer still names this snapshot's parent —
        otherwise another writer committed since this operation read its
        base state, and overwriting would silently drop that writer's
        changes. POSIX rename can't compare-and-swap, so the check+swap
        pair is serialized through a short O_EXCL lock file (stolen if a
        crashed writer left it stale)."""
        sid = snapshot["id"]
        spath = os.path.join(self.root, "snapshots", f"{sid}.json")
        lock = os.path.join(self.root, "manifest.lock")
        fd = None
        for _ in range(100):
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:
                try:
                    if time.time() - os.path.getmtime(lock) > 10.0:
                        os.unlink(lock)  # crashed writer; steal
                        continue
                except OSError:
                    continue  # raced with the holder's release
                time.sleep(0.05)
        if fd is None:
            raise CommitConflict(
                f"could not acquire {lock} — another writer is mid-commit"
            )
        try:
            mp = self._manifest_path()
            current = None
            if os.path.exists(mp):
                with open(mp) as f:
                    current = json.load(f)["snapshot"]
            expected = snapshot.get("parent")
            if current != expected:
                raise CommitConflict(
                    f"base snapshot {expected} was superseded by {current}; "
                    f"re-read the table and redo this merge"
                )
            # manifest write happens INSIDE the CAS: a stale racer with the
            # same next_id must never clobber the winner's committed
            # snapshots/<sid>.json (the file the pointer references)
            stmp = spath + f".tmp-{uuid.uuid4().hex}"
            with open(stmp, "w") as f:
                json.dump(snapshot, f)
            os.replace(stmp, spath)
            tmp = mp + f".tmp-{uuid.uuid4().hex}"
            with open(tmp, "w") as f:
                json.dump({"snapshot": sid}, f)
            os.replace(tmp, mp)  # atomic pointer swap
        finally:
            os.close(fd)
            try:
                os.unlink(lock)
            except OSError:
                pass

    def _log_lineage(self, m: MergeMetrics) -> None:
        with open(os.path.join(self.root, "lineage.jsonl"), "a") as f:
            f.write(json.dumps(m.to_dict()) + "\n")

    def expire_snapshots(self, keep_last: int = 2) -> dict:
        """Delete snapshot manifests — and the data directories no retained
        snapshot references — the Iceberg ``expire_snapshots`` + ``vacuum``
        analog this table previously lacked (every COW merge strands the
        superseded copy of each touched bucket; a long stream grows the
        table's footprint linearly in merges, not in data).

        Retains the current snapshot plus the ``keep_last - 1`` before it
        (older snapshots are no longer time-travel-readable). Readers are
        safe: the manifest pointer always names a retained snapshot, and
        files referenced by any retained snapshot are never touched. Orphan
        snapshots *newer* than the manifest pointer (a crash between
        snapshot write and pointer swap) are cleaned up too.
        """
        import shutil

        stats = {"snapshots_removed": 0, "dirs_removed": 0}
        snap = self.current_snapshot()
        if snap is None or keep_last < 1:
            return stats
        sdir = os.path.join(self.root, "snapshots")
        ids = sorted(
            int(f[:-5]) for f in os.listdir(sdir) if f.endswith(".json")
        )
        cur = snap["id"]
        retained = {i for i in ids if cur - keep_last < i <= cur}
        referenced: set[str] = set()
        for i in sorted(retained):
            with open(os.path.join(sdir, f"{i}.json")) as f:
                s = json.load(f)
            for plist in s["buckets"].values():
                referenced.update(os.path.normpath(p) for p in plist)
        data_root = os.path.join(self.root, "data")
        for d in sorted(os.listdir(data_root)):
            dpath = os.path.join(data_root, d)
            if not os.path.isdir(dpath):
                continue
            for b in sorted(os.listdir(dpath)):
                bpath = os.path.normpath(os.path.join(dpath, b))
                if os.path.isdir(bpath) and bpath not in referenced:
                    shutil.rmtree(bpath, ignore_errors=True)
                    stats["dirs_removed"] += 1
            # drop the snapshot dir once no bucket dirs remain (write-marker
            # files like _SUCCESS don't keep it alive)
            if not any(
                os.path.isdir(os.path.join(dpath, e)) for e in os.listdir(dpath)
            ):
                shutil.rmtree(dpath, ignore_errors=True)
        for i in ids:
            if i not in retained:
                os.remove(os.path.join(sdir, f"{i}.json"))
                stats["snapshots_removed"] += 1
        return stats

    # ---------------- read path ----------------

    def _bucket_expr(self, df: DataFrame):
        return F.pmod(F.xxhash64(*[F.col(k) for k in self.merge_keys]), F.lit(self.n_buckets))

    def _salt_expr(self):
        """Key-determined sub-partition salt: a second, independent hash of
        the merge key (seeded so it does not correlate with the bucket
        hash), pmod merge_salts — every row of a key maps to one salt."""
        return F.pmod(
            F.xxhash64(F.lit("__merge_salt"), *[F.col(k) for k in self.merge_keys]),
            F.lit(self.merge_salts),
        )

    def _resolve_winners(self, df: DataFrame, extra_order=()) -> DataFrame:
        """Latest row per merge key in ONE bucket-partitioned sort (see
        merge() §2): order by (keys, order_col desc, __snap desc, extras),
        keep the first row of every key run. With merge_salts > 1 the
        exchange/sort partitioning is (bucket, key-salt) — same correctness
        (keys never straddle salts), n_buckets*merge_salts-way parallel."""
        snap_ord = F.coalesce(F.col(_SNAP_COL), F.lit(-1)).desc()
        key_struct = F.struct(*[F.col(k) for k in self.merge_keys])
        parts = [F.col(_BUCKET_COL)]
        if self.merge_salts > 1:
            parts.append(self._salt_expr())
        w = Window.partitionBy(*parts).orderBy(
            *self.merge_keys, F.col(self.order_col).desc(), snap_ord, *extra_order
        )
        prev_key = F.lag(key_struct).over(w)
        return (
            df.withColumn(_RN_COL, prev_key.isNull() | (prev_key != key_struct))
            .filter(F.col(_RN_COL))
            .drop(_RN_COL)
        )

    def read(
        self, buckets: Sequence[int] | None = None, as_of: int | None = None
    ) -> DataFrame:
        """Current table state (snapshot-consistent). In MOR mode (any
        bucket holding delta files) superseded versions are resolved here.

        ``buckets`` prunes the scan to the given bucket ids — the
        lookup-side optimization for read-modify-write accumulates: a cycle
        touching k of N buckets reads k/N of the table, not all of it.

        ``as_of`` time-travels: read the table exactly as snapshot
        ``as_of`` committed it (a retained snapshot's file list IS that
        historical state — superseded files stay on disk until
        ``expire_snapshots`` reclaims them, which bounds the horizon)."""
        snap = self.current_snapshot() if as_of is None else self.snapshot_at(as_of)
        if snap is None or not any(snap["buckets"].values()):
            schema = ", ".join(f"`{k}` string" for k in self.merge_keys)
            return self.spark.createDataFrame([], schema)
        wanted = (
            snap["buckets"]
            if buckets is None
            else {str(b): snap["buckets"].get(str(b), []) for b in buckets}
        )
        paths = sorted({p for plist in wanted.values() for p in plist})
        if not paths:
            schema = ", ".join(f"`{k}` string" for k in self.merge_keys)
            return self.spark.createDataFrame([], schema)
        df = self.spark.read.option("mergeSchema", "true").parquet(*paths)
        if _SNAP_COL not in df.columns:
            return self._drop_tombstones(df)  # legacy files
        if any(len(v) > 1 for v in wanted.values()):
            df = df.withColumn(_BUCKET_COL, self._bucket_expr(df))
            df = self._resolve_winners(df)
        return self._drop_tombstones(df.drop(_SNAP_COL))

    def _drop_tombstones(self, df: DataFrame) -> DataFrame:
        """Hide CDC-deleted rows from the visible state (see delete_where).
        Runs AFTER winner resolution: only a key whose *latest* row is a
        tombstone disappears. coalesce(False) keeps rows where the
        predicate is NULL (pre-evolution files lacking the op column)."""
        if self.delete_where is None:
            return df
        try:
            return df.filter(~F.coalesce(F.expr(self.delete_where), F.lit(False)))
        except Exception:
            # no file carries the op column yet (pre-evolution table):
            # nothing can be a tombstone
            return df

    def changes_since(self, snapshot_id: int) -> DataFrame:
        """Net row-level changes committed AFTER ``snapshot_id`` — the
        CDC-out / incremental-consumption surface (Iceberg's incremental
        scan): each key that changed appears ONCE with its current row,
        plus ``_change_type`` = 'upsert' | 'delete' (tombstones are
        INCLUDED here — downstream consumers must see deletes — unlike
        ``read()``, which hides them).

        Works because every row persists the snapshot id that wrote it
        (``__snap``), and winner resolution keeps the winner's own id: a
        key's current version carries exactly the snapshot that last
        changed it. Buckets whose files all predate ``snapshot_id`` are
        pruned from the scan by path (file dirs are ``s<id>/``), so the
        cost scales with changed buckets, not table size.
        """
        import re as _re

        snap = self.current_snapshot()
        empty_schema = ", ".join(f"`{k}` string" for k in self.merge_keys)
        if snap is None or snapshot_id >= snap["id"]:
            return self.spark.createDataFrame([], empty_schema + ", `_change_type` string")

        def _dir_id(path: str) -> int:
            m = _re.search(r"[/\\]s(\d+)(?:-[A-Za-z0-9-]*)?[/\\]", path + "/")
            return int(m.group(1)) if m else -1

        # bucket pruning: a bucket can only hold post-sid winners if SOME
        # of its files were written after sid (conservative for -compact
        # dirs, whose rows keep their original __snap)
        wanted = {
            b: plist
            for b, plist in snap["buckets"].items()
            if any(_dir_id(p) > snapshot_id for p in plist)
        }
        paths = sorted({p for plist in wanted.values() for p in plist})
        if not paths:
            return self.spark.createDataFrame([], empty_schema + ", `_change_type` string")
        df = self.spark.read.option("mergeSchema", "true").parquet(*paths)
        if _SNAP_COL not in df.columns:
            return self.spark.createDataFrame([], empty_schema + ", `_change_type` string")
        df = df.withColumn(_BUCKET_COL, self._bucket_expr(df))
        out = self._resolve_winners(df).filter(F.col(_SNAP_COL) > snapshot_id)
        if self.delete_where is not None:
            is_del = F.coalesce(F.expr(self.delete_where), F.lit(False))
        else:
            is_del = F.lit(False)
        return out.withColumn(
            "_change_type", F.when(is_del, F.lit("delete")).otherwise(F.lit("upsert"))
        ).drop(_SNAP_COL)

    def purge_tombstones(self, below_seq: int) -> dict:
        """Physically remove tombstones with ``order_col < below_seq`` —
        the delete-file compaction a long-running CDC table needs
        (tombstones otherwise accumulate forever; see delete_where for why
        they must be retained at merge time).

        SAFETY CONTRACT: only call with ``below_seq`` at or below the
        replay low-watermark (e.g. the stream checkpoint's last synced
        seq). A tombstone may be dropped only when no future batch can
        carry a lower-seq row for its key — otherwise that late row would
        resurrect the key.

        Rewrites only the buckets that actually hold purgeable tombstones
        (resolving winners first, so this doubles as a compaction of those
        buckets' delta chains in MOR mode) and commits a new snapshot;
        ``expire_snapshots`` reclaims the superseded files.
        """
        if self.delete_where is None:
            raise ValueError("purge_tombstones requires delete_where")
        snap = self.current_snapshot()
        stats = {"buckets_rewritten": 0, "tombstones_removed": 0, "snapshot_id": None}
        if snap is None:
            return stats
        paths = sorted({p for plist in snap["buckets"].values() for p in plist})
        if not paths:
            return stats
        df = self.spark.read.option("mergeSchema", "true").parquet(*paths)
        if _SNAP_COL not in df.columns:
            return stats
        df = df.withColumn(_BUCKET_COL, self._bucket_expr(df))
        try:
            is_del = F.coalesce(F.expr(self.delete_where), F.lit(False))
            purgeable = is_del & (F.col(self.order_col) < F.lit(below_seq))
            # bounded collect: at most n_buckets rows
            hit = (
                df.filter(purgeable)
                .select(_BUCKET_COL)
                .groupBy(_BUCKET_COL)
                .count()
                .collect()
            )
        except Exception:
            return stats  # no file carries the op column yet: no tombstones
        if not hit:
            return stats
        touched = sorted(int(r[0]) for r in hit)
        stats["tombstones_removed"] = int(sum(r[1] for r in hit))
        next_id = snap["id"] + 1
        sub = df.filter(F.col(_BUCKET_COL).isin(touched))
        rewritten = self._resolve_winners(sub).filter(~purgeable)
        out_dir = os.path.join(self.root, "data", f"s{next_id:06d}-purge-{self._attempt_token()}")
        rewritten.write.mode("overwrite").partitionBy(_BUCKET_COL).parquet(out_dir)
        new_buckets = dict(snap["buckets"])
        for b in touched:
            bpath = os.path.join(out_dir, f"{_BUCKET_COL}={b}")
            new_buckets[str(b)] = [bpath] if os.path.exists(bpath) else []
        snapshot = dict(snap)
        snapshot.update({"id": next_id, "parent": snap["id"], "buckets": new_buckets})
        self._commit(snapshot)
        stats["buckets_rewritten"] = len(touched)
        stats["snapshot_id"] = next_id
        self._log_lineage(
            MergeMetrics(
                batch_id=f"purge-below-{below_seq}",
                snapshot_id=next_id,
                rows_in=0,
                rows_after_dedup=0,
                buckets_touched=len(touched),
                n_buckets=self.n_buckets,
                seconds=0.0,
                extra={"tombstones_removed": stats["tombstones_removed"]},
            )
        )
        if self.auto_expire_keep is not None:
            self.expire_snapshots(keep_last=self.auto_expire_keep)
        return stats

    def touched_buckets(self, df: DataFrame) -> list[int]:
        """Bucket ids a batch's keys hash into (column-pruned aggregate)."""
        rows = (
            df.select(self._bucket_expr(df).alias(_BUCKET_COL))
            .distinct()
            .collect()
        )
        return sorted(int(r[0]) for r in rows)

    def latest_state(self, keys: Sequence[str] = ("repo", "path")) -> DataFrame:
        """Latest row per (sub)key by order_col — the 'current file content'
        view (the reference's wallet/token current-state collections)."""
        w = Window.partitionBy(*keys).orderBy(F.col(self.order_col).desc(), F.col("commit").desc())
        return (
            self.read()
            .withColumn(_RN_COL, F.row_number().over(w))
            .filter(F.col(_RN_COL) == 1)
            .drop(_RN_COL)
        )

    # ---------------- merge (the upsert) ----------------

    def merge(self, batch: DataFrame, batch_id: str) -> MergeMetrics:
        """MERGE batch INTO table ON merge_keys, latest-order_col-wins.

        Idempotent per ``batch_id`` AND per key: re-merging a committed batch
        is a pointer-level no-op; re-merging the same *rows* under a new
        batch_id converges to the same state (dedup on merge keys).
        """
        t0 = time.time()
        snap = self.current_snapshot()
        committed = set(snap["committed_batches"]) if snap else set()
        next_id = (snap["id"] + 1) if snap else 0

        if batch_id in committed:
            m = MergeMetrics(batch_id, snap["id"], 0, 0, 0, self.n_buckets, time.time() - t0, noop=True)
            self._log_lineage(m)
            return m

        # 1. light pass — touched buckets + rows_in in one column-pruned
        #    aggregation (only the merge-key columns are evaluated; Catalyst
        #    prunes the heavy normalize expressions upstream). Partial
        #    map-side combine means only ~n_buckets rows ever shuffle.
        bucket_stats = (
            batch.select(self._bucket_expr(batch).alias(_BUCKET_COL))
            .groupBy(_BUCKET_COL)
            .count()
            .collect()
        )
        touched = sorted(int(r[0]) for r in bucket_stats)
        rows_in = int(sum(r[1] for r in bucket_stats))

        old_buckets: dict[str, list[str]] = dict(snap["buckets"]) if snap else {}
        existing_paths = [p for b in touched for p in old_buckets.get(str(b), [])]

        # 2. main pass — ONE shuffle, ONE sort: in-batch dedup and
        #    resolve-vs-existing are the same rule (latest order_col wins,
        #    incoming beats existing on ties — CDC replace_one semantics,
        #    mongo_db.py:72-83), so both collapse into a single window: hash-
        #    exchange by bucket (write-aligned), sort each partition by
        #    (bucket, key, order desc, is_new desc), keep the first row of
        #    every key run via lag(). All rows of a key share its bucket, so
        #    bucket-partitioning is correct for the per-key window.
        #    MOR mode skips the union entirely: only the deduped batch is
        #    written (as a delta per bucket) and supersession is left to
        #    read-time resolution — merge cost O(batch), not O(table).
        mor_append = self.mode == "mor" and bool(existing_paths)
        new_part = (
            batch.withColumn(_BUCKET_COL, self._bucket_expr(batch))
            .withColumn(_SNAP_COL, F.lit(next_id))
            .withColumn(_IS_NEW_COL, F.lit(1))
        )
        if existing_paths and not mor_append:
            existing = self.spark.read.option("mergeSchema", "true").parquet(*existing_paths)
            # bucket value is derivable from the key; recompute rather
            # than trusting directory names (survives schema drift)
            existing = existing.withColumn(_BUCKET_COL, self._bucket_expr(existing))
            if _SNAP_COL not in existing.columns:
                existing = existing.withColumn(_SNAP_COL, F.lit(-1))
            existing = existing.withColumn(_IS_NEW_COL, F.lit(0))
            merged = new_part.unionByName(existing, allowMissingColumns=True)
        else:
            merged = new_part
        resolved = self._resolve_winners(
            merged, extra_order=(F.col(_IS_NEW_COL).desc(),)
        ).drop(_IS_NEW_COL)

        # 3. write files for touched buckets only; the data is already
        #    exchanged on the bucket column, so partitionBy writes straight
        #    out of the window's partitioning — no second shuffle
        out_dir = os.path.join(self.root, "data", f"s{next_id:06d}-{self._attempt_token()}")
        obs = Observation()
        resolved = resolved.observe(obs, F.count(F.lit(1)).alias("rows_out"))
        resolved.write.mode("overwrite").partitionBy(_BUCKET_COL).parquet(out_dir)
        rows_dedup = int(obs.get["rows_out"]) if touched else 0

        new_buckets = dict(old_buckets)
        for b in touched:
            bpath = os.path.join(out_dir, f"{_BUCKET_COL}={b}")
            if os.path.exists(bpath):
                if mor_append:
                    new_buckets[str(b)] = new_buckets.get(str(b), []) + [bpath]
                else:
                    new_buckets[str(b)] = [bpath]

        # 3b. auto-compaction (MOR): buckets whose delta chain grew past the
        #     threshold are rewritten to a single winners file inside this
        #     same commit, bounding read-time resolution cost
        if mor_append:
            overlong = {
                b: fs for b, fs in new_buckets.items() if len(fs) > self.compact_threshold
            }
            if overlong:
                cpaths = sorted({p for fs in overlong.values() for p in fs})
                cdf = self.spark.read.option("mergeSchema", "true").parquet(*cpaths)
                cdf = cdf.withColumn(_BUCKET_COL, self._bucket_expr(cdf))
                if _SNAP_COL not in cdf.columns:
                    cdf = cdf.withColumn(_SNAP_COL, F.lit(-1))
                compacted = self._resolve_winners(cdf)
                cdir = os.path.join(self.root, "data", f"s{next_id:06d}-compact-{self._attempt_token()}")
                compacted.write.mode("overwrite").partitionBy(_BUCKET_COL).parquet(cdir)
                for b in overlong:
                    bpath = os.path.join(cdir, f"{_BUCKET_COL}={b}")
                    if os.path.exists(bpath):
                        new_buckets[b] = [bpath]

        snapshot = {
            "id": next_id,
            "parent": snap["id"] if snap else None,
            "buckets": new_buckets,
            "committed_batches": sorted(committed | {batch_id}),
            "merge_keys": self.merge_keys,
            "order_col": self.order_col,
            "n_buckets": self.n_buckets,
            "merge_salts": self.merge_salts,
        }
        self._commit(snapshot)
        if self.auto_expire_keep is not None:
            self.expire_snapshots(keep_last=self.auto_expire_keep)

        m = MergeMetrics(
            batch_id,
            next_id,
            rows_in,
            rows_dedup,
            len(touched),
            self.n_buckets,
            time.time() - t0,
        )
        self._log_lineage(m)
        return m
