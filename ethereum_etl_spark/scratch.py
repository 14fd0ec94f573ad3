"""Scratch-directory lifecycle for operator materializations.

Several operators materialize an intermediate or result table to parquet as
a deliberate barrier against Catalyst project-collapse re-evaluation (see
``dedup.minhash_lsh_pairs``, ``similarity.embedding_near_dup_pairs_banded``,
``traces.flatten_geth_traces_relational``). The *write* is load-bearing; the
*directory* is not — and before this module each call leaked a
``tempfile.mkdtemp`` dir, so long-running sessions accumulated unbounded
/tmp data (this repo's own round-2 lesson: a near-full disk crashes shuffle
writers and silently degrades timings).

Rules:

- every scratch dir is created under ONE per-process root and registered;
- ``atexit`` removes the whole root — a returned DataFrame lazily reads its
  parquet, so eager deletion is unsafe, but process exit is always safe;
- callers that manage their own storage pass ``path=`` (caller-owned dirs
  are never touched) or call :func:`release` as soon as the consumer is
  done with the data;
- on a real cluster the root must be shared storage — set
  ``SPARK_ETL_SCRATCH_DIR`` (e.g. an object-store prefix mounted on the
  driver, or a cluster-visible NFS path).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import threading

from pyspark.sql import DataFrame

_lock = threading.Lock()
_root: str | None = None
_dirs: set[str] = set()


def _ensure_root() -> str:
    global _root
    with _lock:
        if _root is None:
            base = os.environ.get("SPARK_ETL_SCRATCH_DIR")
            if base:
                os.makedirs(base, exist_ok=True)
            _root = tempfile.mkdtemp(prefix="etl_scratch_", dir=base or None)
            atexit.register(cleanup_all)
        return _root


def scratch_dir(prefix: str) -> str:
    """A fresh tracked directory under the per-process scratch root."""
    d = tempfile.mkdtemp(prefix=prefix, dir=_ensure_root())
    with _lock:
        _dirs.add(d)
    return d


def release(path: str) -> None:
    """Delete one scratch dir as soon as its consumer is done with it.
    No-op for paths this module does not own (caller-owned storage)."""
    with _lock:
        if path not in _dirs:
            return
        _dirs.discard(path)
    shutil.rmtree(path, ignore_errors=True)


def cleanup_all() -> None:
    """Remove every tracked dir and the root (atexit; also callable from
    long-running drivers between cycles)."""
    global _root
    with _lock:
        root, _root = _root, None
        _dirs.clear()
    if root:
        shutil.rmtree(root, ignore_errors=True)


def tracked_dirs() -> list[str]:
    with _lock:
        return sorted(_dirs)


def materialize(df: DataFrame, prefix: str, path: str | None = None) -> DataFrame:
    """Write ``df`` to parquet and read it back — the project-collapse /
    fan-out barrier every multi-read intermediate needs (see memory:
    referencing an expensive projection N times re-evaluates it N times).

    With ``path`` the caller owns the directory (nothing is tracked or ever
    deleted here); otherwise the dir is a tracked scratch dir removed at
    process exit (or earlier via :func:`release`)."""
    out_dir = path if path is not None else scratch_dir(prefix)
    df.write.mode("overwrite").parquet(out_dir)
    return df.sparkSession.read.parquet(out_dir)
