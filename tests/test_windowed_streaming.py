"""Watermarked windowed rollup: batch/stream parity + late-event drop."""

import time

from pyspark.sql import functions as F

from ethereum_etl_spark.streaming.windowed import windowed_rollup

SCHEMA = "ts timestamp, event_type string, value double"
T0 = "2024-01-01 10:"


def _rows(*specs):
    return [(f"{T0}{mm}:00", et, v) for (mm, et, v) in specs]


def _df(spark, rows):
    return spark.createDataFrame(
        [(r[0], r[1], r[2]) for r in rows], "ts string, event_type string, value double"
    ).select(F.to_timestamp("ts").alias("ts"), "event_type", "value")


def test_batch_rollup_shape(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = _df(spark, _rows(("00", "a", 1.0), ("03", "a", 2.0), ("06", "b", 4.0)))
    out = {
        (r["window_start"].minute, r["event_type"]): (r["n"], float(r["total"]))
        for r in windowed_rollup(df, window_duration="5 minutes").collect()
    }
    assert out[(0, "a")] == (2, 3.0)
    assert out[(5, "b")] == (1, 4.0)


def test_stream_drops_events_later_than_watermark(spark, tmp_path):
    """File A advances the watermark past 10:20; file B's 10:05 event is
    beyond-watermark late and must be dropped, while its 10:31 event lands."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = tmp_path / "stream_src"
    ck = str(tmp_path / "ck")
    a = _df(spark, _rows(("00", "a", 1.0), ("04", "a", 2.0), ("30", "a", 8.0)))
    a.coalesce(1).write.mode("overwrite").parquet(str(src / "f=1"))

    rows = []

    def run_drain():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*")
        )
        rollup = windowed_rollup(
            stream, window_duration="5 minutes", watermark_delay="10 minutes"
        )
        q = (
            rollup.writeStream.foreachBatch(
                lambda batch, _bid: rows.extend(batch.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_drain()  # batch 1: watermark advances to 10:30 - 10m = 10:20

    b = _df(spark, _rows(("05", "a", 100.0), ("31", "a", 16.0)))
    b.coalesce(1).write.mode("overwrite").parquet(str(src / "f=2"))
    time.sleep(0.2)
    run_drain()  # batch 2: 10:05 is < watermark -> dropped
    # updates accumulate; final value per window = the max-n update
    final = {}
    for r in rows:
        k = (r["window_start"].minute, r["event_type"])
        if k not in final or r["n"] > final[k][0]:
            final[k] = (r["n"], float(r["total"]))
    # 10:00-05 window: the late 100.0 at 10:05 must NOT appear
    assert final[(0, "a")] == (2, 3.0)
    # on-time late-file event counted
    assert final[(30, "a")][0] >= 1
