"""export-* CLI subcommands: the `ethereumetl export_*` UX (reference
setup.py:59-61 entry points) over raw parquet — golden CSV/JSONL outputs
must match the oracle-checked exporter DataFrames byte-for-value."""

import json
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from ethereum_etl_spark import cli  # noqa: E402
from ethereum_etl_spark.plans.entities import export_blocks, export_logs  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def _stringified(df):
    return {
        tuple("" if v is None else str(v) for v in row)
        for row in df.select([F.col(c).cast("string") for c in df.columns]).collect()
    }


def _csv_rows(spark, path, columns):
    got = spark.read.option("header", "true").option("emptyValue", "").csv(path)
    assert got.columns == columns  # header preserves the reference field order
    return {
        tuple("" if v is None else str(v) for v in row)
        for row in got.collect()
    }


def test_export_blocks_cli_golden_csv(spark, tmp_path, capsys):
    raw_dir = str(tmp_path / "raw_blocks")
    entry._synth_raw_blocks(entry._tp(spark, SF_DIR, "events")).write.parquet(raw_dir)
    out_dir = str(tmp_path / "blocks_csv")
    rc = cli.main(
        ["export-blocks", "--input", raw_dir, "--out", out_dir,
         "--format", "csv", "--single-file"]
    )
    assert rc == 0
    status = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert status == {"entity": "blocks", "out": out_dir, "format": "csv"}
    golden = export_blocks(spark.read.parquet(raw_dir))
    assert _csv_rows(spark, out_dir, golden.columns) == _stringified(golden)


def test_export_logs_cli_block_range_and_jsonl(spark, tmp_path, capsys):
    ev = entry._tp(spark, SF_DIR, "events")
    eid = F.col("event_id")
    e = eid.cast("string")
    bn = (eid / 10).cast("long")
    raw = ev.select(
        F.concat(F.lit("0x"), F.conv((eid % 1000).cast("string"), 10, 16)).alias("logIndex"),
        F.concat(F.lit("0x"), F.md5(F.concat(F.lit("txh:"), e))).alias("transactionHash"),
        F.lit("0x1").alias("transactionIndex"),
        F.concat(F.lit("0x"), F.md5(bn.cast("string"))).alias("blockHash"),
        F.concat(F.lit("0x"), F.conv(bn.cast("string"), 10, 16)).alias("blockNumber"),
        F.upper(F.concat(F.lit("0xAB"), F.repeat(F.lit("0"), 38))).alias("address"),
        F.lit("0xdd").alias("data"),
        F.array(F.lit("0xt0"), F.concat(F.lit("0xt1-"), e)).alias("topics"),
    )
    raw_dir = str(tmp_path / "raw_logs")
    raw.write.parquet(raw_dir)

    out_csv = str(tmp_path / "logs_csv")
    rc = cli.main(
        ["export-logs", "--input", raw_dir, "--out", out_csv, "--format", "csv",
         "--start-block", "2", "--end-block", "4", "--single-file"]
    )
    assert rc == 0
    golden = export_logs(spark.read.parquet(raw_dir)).filter(
        F.col("block_number").between(2, 4)
    )
    # the CSV sink comma-joins the topics array, like the reference sink
    golden_csv = golden.withColumn("topics", F.concat_ws(",", "topics"))
    assert _csv_rows(spark, out_csv, golden.columns) == _stringified(golden_csv)
    n_range = golden.count()
    assert 0 < n_range < export_logs(spark.read.parquet(raw_dir)).count()

    out_json = str(tmp_path / "logs_jsonl")
    rc = cli.main(["export-logs", "--input", raw_dir, "--out", out_json,
                   "--format", "jsonl"])
    assert rc == 0
    back = spark.read.json(out_json)
    assert back.count() == export_logs(spark.read.parquet(raw_dir)).count()
    # jsonl keeps topics as a real array
    assert back.select(F.size("topics")).first()[0] == 2


def test_vacuum_cli(spark, tmp_path, capsys):
    from ethereum_etl_spark.plans.merge import MergeTable

    root = str(tmp_path / "t")
    t = MergeTable(spark, root, n_buckets=4)
    for i in range(4):
        batch = spark.range(20).select(
            F.concat(F.lit("r"), (F.col("id") % 4).cast("string")).alias("repo"),
            F.concat(F.lit("p"), F.col("id").cast("string")).alias("path"),
            F.lit(f"c{i}").alias("commit"),
            (F.col("id") + i * 100).alias("seq"),
        )
        t.merge(batch, f"b{i}")
    rc = cli.main(["vacuum", "--table", root, "--keep-last", "1"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["snapshots_removed"] == 3 and stats["dirs_removed"] > 0
    assert [d[:7] for d in os.listdir(os.path.join(root, "data"))] == ["s000003"]
    assert t.read().count() == 80  # 4 distinct commits x 20 paths, all live


def test_changes_since_cli(spark, tmp_path, capsys):
    from ethereum_etl_spark.plans.merge import MergeTable

    root = str(tmp_path / "t")
    t = MergeTable(spark, root, n_buckets=4, delete_where="op = 'd'")
    def mk(rows):
        return spark.createDataFrame(
            rows, "seq long, repo string, path string, commit string, op string")
    t.merge(mk([(1, "r", "a.py", "c1", "u"), (2, "r", "b.py", "c2", "u")]), "b0")
    t.merge(mk([(3, "r", "a.py", "c1", "u"), (4, "r", "b.py", "c2", "d")]), "b1")
    out = str(tmp_path / "delta")
    rc = cli.main(["changes-since", "--table", root, "--snapshot", "0",
                   "--out", out, "--buckets", "4", "--delete-where", "op = 'd'"])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["current_snapshot"] == 1 and info["since_snapshot"] == 0
    back = {r["commit"]: r["_change_type"]
            for r in spark.read.parquet(out).collect()}
    assert back == {"c1": "upsert", "c2": "delete"}
