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


def test_session_rollup_batch_merges_on_gap(spark):
    # key a: events at 10:00, 10:10 (within 15m gap -> one session),
    # then 10:40 (>= gap after 10:10 -> new session); key b: one event.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from ethereum_etl_spark.streaming.windowed import session_rollup

    df = _df(spark, _rows(("00", "a", 1.0), ("10", "a", 2.0),
                          ("40", "a", 4.0), ("05", "b", 8.0)))
    out = {
        (r["event_type"], r["session_start"].minute): (
            r["n"], float(r["total"]), r["session_end"].minute)
        for r in session_rollup(
            df, gap="15 minutes", keys=("event_type",)).collect()
    }
    # session end = last event + gap
    assert out[("a", 0)] == (2, 3.0, 25)
    assert out[("a", 40)] == (1, 4.0, 55)
    assert out[("b", 5)] == (1, 8.0, 20)


def test_session_rollup_stream_merges_across_batches(spark, tmp_path):
    """An open session from micro-batch 1 must MERGE with batch 2's adjacent
    event (session-state merge). Session windows stream in APPEND mode: a
    session is emitted exactly once, only after the watermark passes its
    end — so the still-open last session is withheld (state, not output)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from ethereum_etl_spark.streaming.windowed import session_rollup

    src = tmp_path / "sess_src"
    ck = str(tmp_path / "ck_sess")
    a = _df(spark, _rows(("00", "a", 1.0), ("10", "a", 2.0)))
    a.coalesce(1).write.mode("overwrite").parquet(str(src / "f=1"))
    b = _df(spark, _rows(("20", "a", 4.0), ("59", "a", 8.0)))
    b.coalesce(1).write.mode("overwrite").parquet(str(src / "f=2"))

    rows = []
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    rollup = session_rollup(
        stream, gap="15 minutes", watermark_delay="5 minutes",
        keys=("event_type",),
    )
    q = (
        rollup.writeStream.foreachBatch(
            lambda batch, _bid: rows.extend(batch.collect())
        )
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_type"], r["session_start"].minute): (
            r["n"], float(r["total"]), r["session_end"].minute)
        for r in rows
    }
    # 10:00 and 10:10 (batch 1) merged with 10:20 (batch 2): one session of
    # 3 events, closed because the watermark (10:59 - 5m) passed its 10:35 end
    assert got == {("a", 0): (3, 7.0, 35)}
