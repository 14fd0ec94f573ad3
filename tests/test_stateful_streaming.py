"""applyInPandasWithState running balances: state carries across
micro-batches and across query restarts via the checkpoint."""

from pyspark.sql import functions as F

from ethereum_etl_spark.streaming.stateful import streaming_balances

SCHEMA = "address string, token_address string, delta double, block_number long"


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _drain(spark, src, ckpt, out_dir):
    deltas = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)

    def sink(batch_df, batch_id):
        if batch_df.count():
            batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(out_dir)

    q = (
        streaming_balances(deltas)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_state_accumulates_across_batches_and_restarts(spark, tmp_path):
    src, ckpt, out = str(tmp_path / "src"), str(tmp_path / "ck"), str(tmp_path / "out")

    _write(spark, src, [("0xa", "0xt", 10.0, 1), ("0xa", "0xt", 5.0, 2),
                        ("0xb", "0xt", 7.0, 2)])
    _drain(spark, src, ckpt, out)
    rows1 = spark.read.parquet(out).collect()
    a1 = [r for r in rows1 if r["address"] == "0xa"]
    # one emission per micro-batch that touched the key; the LAST one holds
    # the accumulated balance
    last_a = max(a1, key=lambda r: r["batch_id"])
    assert last_a["new_balance"] == 15.0
    assert sum(r["n_events"] for r in a1) == 2

    # new data + a NEW query on the same checkpoint: the state store restores
    # previous balances (the reference's cache, now durable across restarts)
    _write(spark, src, [("0xa", "0xt", -4.0, 3), ("0xc", "0xt", 1.0, 3)])
    _drain(spark, src, ckpt, out)
    rows2 = spark.read.parquet(out).collect()
    newest = {r["address"]: r for r in rows2
              if r["batch_id"] == max(x["batch_id"] for x in rows2)}
    assert newest["0xa"]["old_balance"] == 15.0
    assert newest["0xa"]["new_balance"] == 11.0
    assert newest["0xa"]["last_block"] == 3
    assert newest["0xc"]["old_balance"] == 0.0 and newest["0xc"]["new_balance"] == 1.0
    # untouched key '0xb' emits nothing in the new batch (update mode)
    assert "0xb" not in newest
