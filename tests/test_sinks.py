"""File sinks: CSV/JSONL semantics vs the reference's exporter rules."""

import glob
import json

from pyspark.sql import functions as F

from ethereum_etl_spark.sinks import (
    explode_list_column,
    render_unix_timestamps,
    write_entity_csv,
    write_entity_jsonl,
    write_multiplexed,
)


def _df(spark):
    return spark.createDataFrame(
        [
            (1, ["0xaa", "0xbb"], {"t1": 5}, 86400),
            (2, ["0xcc"], {"t2": 7}, 90061),
        ],
        "id long, topics array<string>, balances map<string,int>, block_timestamp long",
    )


def test_csv_arrays_comma_joined_fixed_fields(spark, tmp_path):
    out = str(tmp_path / "csv")
    write_entity_csv(
        _df(spark), out, fields=["id", "topics", "missing_col"], single_file=True
    )
    lines = open(glob.glob(f"{out}/part-*.csv")[0]).read().splitlines()
    assert lines[0] == "id,topics,missing_col"
    rows = {l.split(",", 1)[0]: l for l in lines[1:]}
    # topics joined with ',' (quoted by csv), missing field -> empty
    assert '"0xaa,0xbb"' in rows["1"] and rows["1"].endswith(",")


def test_jsonl_and_multiplex(spark, tmp_path):
    paths = write_multiplexed(
        {"blocks": _df(spark).select("id"), "logs": _df(spark).select("id", "topics")},
        str(tmp_path / "multi"),
        fmt="json",
    )
    assert set(paths) == {"blocks", "logs"}
    recs = [
        json.loads(l)
        for p in glob.glob(paths["logs"] + "/part-*")
        for l in open(p).read().splitlines()
    ]
    assert {r["id"] for r in recs} == {1, 2}
    assert sorted(recs, key=lambda r: r["id"])[0]["topics"] == ["0xaa", "0xbb"]


def test_timestamp_render_and_list_explode(spark):
    df = render_unix_timestamps(_df(spark))
    got = {r["id"]: r["block_timestamp"] for r in df.collect()}
    assert got[1] == "1970-01-02 00:00:00"
    assert got[2] == "1970-01-02 01:01:01"

    ex = explode_list_column(_df(spark), "topics", 3, prefix="topic")
    r = {x["id"]: x for x in ex.collect()}
    assert r[1]["topic0"] == "0xaa" and r[1]["topic1"] == "0xbb" and r[1]["topic2"] == ""
    assert r[2]["topic1"] == "" and "topics" not in ex.columns
