"""Gap-based sessionization: semantics on a hand-built event log, plus the
single-shuffle plan property the operator promises."""

import datetime as dt

from pyspark.sql import functions as F

from ethereum_etl_spark.operators.sessions import session_stats, sessionize


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), u)
         for i, (u, s) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long",
    )


def test_sessionize_splits_on_gap(spark):
    # user 1: events at t=0,100,200 then a 2000s jump -> two sessions;
    # user 2: single event -> one session.
    ev = _ev(spark, [(1, 0), (1, 100), (1, 200), (1, 2200), (2, 0)])
    got = sessionize(ev, gap_seconds=1000).select(
        "user_id", "event_id", "session_seq"
    ).collect()
    seq = {(r["user_id"], r["event_id"]): r["session_seq"] for r in got}
    assert seq == {(1, 0): 1, (1, 1): 1, (1, 2): 1, (1, 3): 2, (2, 4): 1}


def test_sessionize_tiebreak_makes_order_total(spark):
    # two events at the identical timestamp: the event_id tiebreak pins the
    # lag order, so the pair lands in one session deterministically.
    ev = _ev(spark, [(1, 50), (1, 50), (1, 5000)])
    got = session_stats(ev, gap_seconds=1000).orderBy("session_seq").collect()
    assert [(r["session_seq"], r["n_events"]) for r in got] == [(1, 2), (2, 1)]
    assert got[0]["start_us"] == got[0]["end_us"]


def test_session_stats_bounds_and_counts(spark):
    ev = _ev(spark, [(1, 0), (1, 600), (1, 9000), (1, 9600), (1, 9900)])
    got = {r["session_seq"]: r for r in session_stats(ev, gap_seconds=1000).collect()}
    assert got[1]["n_events"] == 2 and got[2]["n_events"] == 3
    assert got[1]["start_us"] == 1704067200 * 1_000_000
    assert got[1]["end_us"] - got[1]["start_us"] == 600 * 1_000_000
    assert got[2]["end_us"] - got[2]["start_us"] == 900 * 1_000_000


def test_sessionize_single_shuffle_plan(spark):
    ev = _ev(spark, [(1, 0), (2, 10)])
    agg = session_stats(ev, gap_seconds=1000)
    plan = agg._jdf.queryExecution().executedPlan().toString()
    # both window passes and the rollup ride one exchange + one sort
    assert plan.count("Exchange") == 1
    assert plan.count("Sort") == 1
