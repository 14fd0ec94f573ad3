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


def test_exact_stream_wallet_state_kappa_parity(spark, tmp_path):
    """stream_wallet_state (applyInPandasWithState, string-int state) folds
    uint256-scale values exactly — beyond DOUBLE's 2^53 — and its final
    merged table equals the plain batch aggregate (kappa parity)."""
    from ethereum_etl_spark.plans.knowledge_graph import stream_wallet_state
    from ethereum_etl_spark.plans.merge import MergeTable

    big = 2**200  # far past float precision
    rows = [
        ("0xa", "0xt", str(big), 1),
        ("0xa", "0xt", str(big + 1), 2),
        ("0xa", "0xt", str(-3), 5),
        ("0xb", "0xt", str(7), 2),
    ]
    src = str(tmp_path / "src")
    sch = "address string, token_address string, delta string, block_number long"
    # one file per row -> 4 micro-batches at maxFilesPerTrigger=1: state
    # must carry the huge balance across batches
    for r in rows:
        spark.createDataFrame([r], sch).coalesce(1).write.mode("append").parquet(src)
    wallets = MergeTable(
        spark, str(tmp_path / "w"), merge_keys=["address", "token_address"],
        order_col="at_block_number", n_buckets=4,
    )
    stream_wallet_state(spark, src, wallets, str(tmp_path / "ck"))
    state = {
        (r["address"], r["token_address"]): (r["balance"], r["at_block_number"])
        for r in wallets.read().collect()
    }
    assert state[("0xa", "0xt")] == (str(big + big + 1 - 3), 5)
    assert state[("0xb", "0xt")] == ("7", 2)
