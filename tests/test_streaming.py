"""Chain-tail streaming semantics: lag, batch cap, checkpoint resume,
exactly-once across a crash boundary (SURVEY.md §2.9 T1-T7)."""

import pytest
from pyspark.sql import functions as F

from ethereum_etl_spark.plans.merge import MergeTable
from ethereum_etl_spark.plans.normalize import normalize_changes
from ethereum_etl_spark.sources.datagen import generate_repo_changes
from ethereum_etl_spark.sources.tail import TailSource
from ethereum_etl_spark.streaming.stream import Streamer

N = 1000


@pytest.fixture(scope="module")
def log_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("log") / "changes")
    generate_repo_changes(spark, N, seed=42).write.parquet(p)
    return p


def test_tail_lag_and_batch_cap(spark, log_path):
    src = TailSource(spark, log_path, lag=100, batch_size=300)
    assert src.head_seq() == N - 1
    # lag withholds the newest 100 seqs (reorg settling, streamer.py:110-111)
    assert src.next_range(-1) == (0, 299)  # capped at batch_size
    assert src.next_range(299) == (300, 599)
    assert src.next_range(N - 101) is None  # fully caught up to head - lag
    assert src.next_range(850) == (851, N - 1 - 100)


def test_stream_drain_matches_batch_replay(spark, log_path, tmp_path):
    tbl = MergeTable(spark, str(tmp_path / "t"))
    s = Streamer(spark, TailSource(spark, log_path, batch_size=250), tbl, str(tmp_path / "ck"))
    ms = s.run_until_head()
    assert [m.rows_in for m in ms] == [250, 250, 250, 250]
    assert s.last_synced() == N - 1
    assert tbl.read().count() == N
    # batch replay over the same log produces the identical final state
    ref = normalize_changes(spark.read.parquet(log_path))
    assert sorted(r[0] for r in tbl.read().select("sha256").collect()) == sorted(
        r[0] for r in ref.select("sha256").collect()
    )


def test_resume_from_checkpoint_exactly_once(spark, log_path, tmp_path):
    """Crash after 2 cycles → a fresh Streamer resumes and converges to the
    uninterrupted state with no duplicates (T2/K6 + idempotent MERGE)."""
    tbl = MergeTable(spark, str(tmp_path / "t"))
    ck = str(tmp_path / "ck")
    s1 = Streamer(spark, TailSource(spark, log_path, batch_size=200), tbl, ck)
    s1.run_until_head(max_cycles=2)
    assert s1.last_synced() == 399
    del s1  # "crash"

    s2 = Streamer(spark, TailSource(spark, log_path, batch_size=200), tbl, ck)
    # re-merge of the last committed range is a no-op (crash between merge
    # commit and checkpoint write is the dangerous window — simulate it)
    redo = tbl.merge(
        normalize_changes(TailSource(spark, log_path).range_df(200, 399)),
        batch_id="stream-000000000200-000000000399",
    )
    assert redo.noop
    s2.run_until_head()
    assert s2.last_synced() == N - 1
    final = tbl.read()
    assert final.count() == N
    assert final.select("seq").distinct().count() == N


def test_start_seq_conflicts_with_checkpoint(spark, log_path, tmp_path):
    tbl = MergeTable(spark, str(tmp_path / "t"))
    ck = str(tmp_path / "ck")
    Streamer(spark, TailSource(spark, log_path), tbl, ck, start_seq=500).run_until_head()
    with pytest.raises(ValueError, match="conflicts with existing checkpoint"):
        Streamer(spark, TailSource(spark, log_path), tbl, ck, start_seq=0)
    # start_seq honored: only seqs >= 500 were ingested
    assert tbl.read().agg(F.min("seq")).first()[0] == 500


def test_graceful_stop_finishes_cycle_and_resumes(spark, log_path, tmp_path):
    """T6: request_stop lets the in-flight cycle commit (merge + checkpoint)
    and exits at the loop boundary; a fresh Streamer resumes cleanly."""
    import threading

    tbl = MergeTable(spark, str(tmp_path / "t6"))
    src = TailSource(spark, log_path, batch_size=200)
    s = Streamer(spark, src, tbl, str(tmp_path / "ck6"), poll_seconds=0.05)

    done: list = []
    t = threading.Thread(target=lambda: done.append(s.stream(max_seconds=60)))
    t.start()
    # wait for at least one committed cycle, then stop gracefully
    import time as _time

    deadline = _time.time() + 50
    while s.last_synced() < 0 and _time.time() < deadline:
        _time.sleep(0.05)
    s.request_stop()
    t.join(timeout=60)
    assert not t.is_alive()

    synced = s.last_synced()
    # stopped at a cycle boundary: checkpoint covers whole batches only,
    # and the table holds exactly the checkpointed rows (no partial cycle)
    assert synced >= 199 and (synced + 1) % 200 == 0
    assert tbl.read().count() == synced + 1

    # resume drains the remainder exactly once
    s2 = Streamer(spark, src, tbl, str(tmp_path / "ck6"))
    s2.run_until_head()
    assert s2.last_synced() == N - 1
    assert tbl.read().count() == N


def test_legacy_checkpoint_migration(spark, log_path, tmp_path):
    """A reference user's last_synced_block.txt (bare int, streamer.py:
    124-134) is honored as the starting checkpoint and upgraded to JSON on
    the next advance; start_seq still hard-conflicts with it."""
    ck = tmp_path / "legacy_ck"
    ck.mkdir()
    (ck / "last_synced_block.txt").write_text("499\n")

    tbl = MergeTable(spark, str(tmp_path / "tl"))
    src = TailSource(spark, log_path, batch_size=250)
    s = Streamer(spark, src, tbl, str(ck))
    assert s.last_synced() == 499  # resumed from the reference format
    with pytest.raises(ValueError, match="conflicts"):
        Streamer(spark, src, tbl, str(ck), start_seq=0)

    s.run_until_head()
    assert s.last_synced() == N - 1
    # only rows after the legacy checkpoint were ingested
    assert tbl.read().count() == N - 500
    assert tbl.read().agg(F.min("seq")).first()[0] == 500
