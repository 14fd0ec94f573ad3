"""CDC DELETE / tombstone semantics (binlog `op = 'd'` rows).

The reference's chain model is append-only (no delete path in
blockchainetl/streaming/streamer.py), but the north-rule target — a
binlog/WAL-tail lake upsert — must honor DELETEs. Semantics under test:

- a tombstone removes its key from the visible state (read / latest_state)
- tombstones PERSIST in storage: a late replay of pre-delete rows must not
  resurrect the key (the stored tombstone outranks them by order_col)
- rows written before the op column existed (additive schema evolution)
  read as op=NULL and are kept, never dropped
- MOR mode resolves winners at read time — same visibility rules
"""

import pytest
from pyspark.sql import functions as F

from ethereum_etl_spark.plans.merge import MergeTable
from ethereum_etl_spark.plans.replay import replay_range
from ethereum_etl_spark.sources.datagen import generate_repo_changes


def _mk(spark, rows, with_op=True):
    schema = "seq long, repo string, path string, commit string, content string" + (
        ", op string" if with_op else ""
    )
    return spark.createDataFrame(rows, schema)


KEYS = ["repo", "path", "commit"]


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_tombstone_hides_key_and_survives_late_replay(spark, tmp_path, mode):
    t = MergeTable(
        spark, str(tmp_path / f"t_{mode}"), merge_keys=KEYS, n_buckets=4,
        mode=mode, delete_where="op = 'd'",
    )
    ins = _mk(spark, [(1, "r", "a.py", "c1", "v1", "u"), (2, "r", "b.py", "c2", "v2", "u")])
    t.merge(ins, "b1")
    t.merge(_mk(spark, [(3, "r", "a.py", "c1", None, "d")]), "b2")
    vis = {r["commit"]: r for r in t.read().collect()}
    assert set(vis) == {"c2"}, "deleted key must be hidden"
    # late replay of the pre-delete insert under a NEW batch id: the stored
    # tombstone (seq 3) outranks the re-merged seq-1 row
    t.merge(_mk(spark, [(1, "r", "a.py", "c1", "v1", "u")]), "b3")
    assert {r["commit"] for r in t.read().collect()} == {"c2"}
    # a fresh higher-seq upsert of the same key revives it (CDC re-insert)
    t.merge(_mk(spark, [(4, "r", "a.py", "c1", "v1b", "u")]), "b4")
    vis = {r["commit"]: r for r in t.read().collect()}
    assert set(vis) == {"c1", "c2"} and vis["c1"]["content"] == "v1b"


def test_delete_of_never_inserted_key_is_noop(spark, tmp_path):
    t = MergeTable(
        spark, str(tmp_path / "t"), merge_keys=KEYS, n_buckets=4,
        delete_where="op = 'd'",
    )
    t.merge(_mk(spark, [(1, "r", "a.py", "c1", "v1", "u")]), "b1")
    t.merge(_mk(spark, [(2, "r", "z.py", "c9", None, "d")]), "b2")
    assert {r["commit"] for r in t.read().collect()} == {"c1"}


def test_pre_evolution_rows_without_op_are_kept(spark, tmp_path):
    t = MergeTable(
        spark, str(tmp_path / "t"), merge_keys=KEYS, n_buckets=4,
        delete_where="op = 'd'",
    )
    # batch 1 predates the op column entirely (additive schema evolution)
    t.merge(_mk(spark, [(1, "r", "a.py", "c1", "v1")], with_op=False), "b1")
    assert {r["commit"] for r in t.read().collect()} == {"c1"}
    # op column appears later; old rows read as NULL and must be kept
    t.merge(_mk(spark, [(2, "r", "b.py", "c2", "v2", "u")]), "b2")
    vis = {r["commit"]: r["op"] for r in t.read().collect()}
    assert vis == {"c1": None, "c2": "u"}
    # and a tombstone against the pre-evolution key still lands
    t.merge(_mk(spark, [(3, "r", "a.py", "c1", None, "d")]), "b3")
    assert {r["commit"] for r in t.read().collect()} == {"c2"}


def test_ops_datagen_deterministic_and_targets_real_keys(spark):
    df = generate_repo_changes(spark, 600, seed=5, partitions=4, with_ops=True)
    rows = df.orderBy("seq").collect()
    dels = [r for r in rows if r["op"] == "d"]
    assert len(dels) == len([r for r in rows if r["seq"] % 17 == 16])
    by_seq = {r["seq"]: r for r in rows}
    for d in dels[:20]:
        t = max(d["seq"] - 1 - (d["seq"] % 7), 0)
        target = by_seq[t]
        if target["op"] == "u":  # tombstone carries the target's merge key
            assert (d["repo"], d["path"], d["commit"]) == (
                target["repo"], target["path"], target["commit"])
    # default mode output is unchanged (no op column)
    assert "op" not in generate_repo_changes(spark, 10, seed=5).columns


def test_replay_with_deletes_matches_python_oracle(spark, tmp_path):
    n = 1200
    changes = generate_repo_changes(spark, n, seed=5, partitions=4, with_ops=True)
    t = MergeTable(
        spark, str(tmp_path / "t"), n_buckets=4, delete_where="op = 'd'",
    )
    replay_range(spark, changes, t, 0, n - 1, partition_size=400)
    got = {(r["repo"], r["path"], r["commit"]) for r in t.read().collect()}
    # independent oracle: latest row per key from the raw log, drop 'd' winners
    rows = changes.select("seq", "repo", "path", "commit", "op").collect()
    latest = {}
    for r in sorted(rows, key=lambda r: r["seq"]):
        latest[(r["repo"], r["path"], r["commit"])] = r["op"]
    want = {k for k, op in latest.items() if op == "u"}
    assert got == want
