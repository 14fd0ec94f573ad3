"""readStream/foreachBatch ingest: drain, append, resume from checkpoint."""

import duckdb
from pyspark.sql import functions as F

from ethereum_etl_spark.plans.merge import MergeTable
from ethereum_etl_spark.sources.datagen import generate_repo_changes
from ethereum_etl_spark.streaming.structured import stream_changes_to_table


def _write_range(spark, path, start, n, part_label):
    df = generate_repo_changes(spark, n, seed=5, start_seq=start, partitions=2)
    df.write.mode("append").parquet(path)
    assert part_label  # files accumulate; streaming picks up new ones only


def test_available_now_drain_and_resume(spark, tmp_path):
    src = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    root = str(tmp_path / "table")
    _write_range(spark, src, 0, 1200, "a")

    table = MergeTable(spark, root, n_buckets=4)
    stream_changes_to_table(spark, src, table, ckpt, max_files_per_trigger=1)
    assert table.read().count() == 1200

    # new files appear; a NEW query on the SAME checkpoint resumes and picks
    # up only the delta (Spark's file-source offset log)
    _write_range(spark, src, 1200, 800, "b")
    stream_changes_to_table(spark, src, table, ckpt, max_files_per_trigger=1)
    out = table.read()
    assert out.count() == 2000
    assert out.agg(F.max("seq")).first()[0] == 1999

    # final state equals the DuckDB oracle over the raw log (sha256 parity)
    got = sorted(r[0] for r in out.select("sha256").collect())
    want = sorted(
        x[0]
        for x in duckdb.sql(
            f"select sha256(content) from read_parquet('{src}/*.parquet')"
        ).fetchall()
    )
    assert got == want
