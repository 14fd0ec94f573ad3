"""P6 trace flatten: recursive call-tree -> rows with trace_address paths."""

import json

from pyspark.sql import functions as F

from ethereum_etl_spark.operators.traces import (
    flatten_geth_traces,
    flatten_geth_traces_relational,
    flatten_geth_traces_structured,
    genesis_traces,
    route_trace_fields,
)

TREE = {
    "type": "CALL",
    "from": "0xAAA",
    "to": "0xBBB",
    "value": "0x10",
    "calls": [
        {"type": "STATICCALL", "from": "0xBBB", "to": "0xCCC"},
        {
            "type": "CALL",
            "from": "0xBBB",
            "to": "0xDDD",
            "error": "out of gas",
            "calls": [{"type": "CREATE", "from": "0xDDD", "to": "0xEEE"}],
        },
    ],
}


def _fixture(spark):
    return spark.createDataFrame(
        [(7, "0xtx1", json.dumps(TREE)), (8, "0xtx2", None)],
        "block_number long, transaction_hash string, trace_json string",
    )


def test_flatten_paths_and_fields(spark):
    flat = flatten_geth_traces(_fixture(spark))
    rows = {r["trace_address"]: r for r in flat.collect()}
    assert set(rows) == {"", "0", "1", "1,0"}  # null-trace row dropped
    root = rows[""]
    assert root["depth"] == 0 and root["subtraces"] == 2
    assert root["from_address"] == "0xaaa" and root["value_hex"] == "0x10"
    assert rows["0"]["trace_type"] == "staticcall" and rows["0"]["subtraces"] == 0
    assert rows["1"]["error"] == "out of gas" and rows["1"]["subtraces"] == 1
    assert rows["1,0"]["trace_type"] == "create" and rows["1,0"]["depth"] == 2
    assert all(r["block_number"] == 7 for r in rows.values())


def test_relational_flatten_matches_kernel(spark):
    """The pure-JVM level-explode variant produces row-identical output to
    the mapInPandas kernel (incl. dropped null/malformed traces, empty-type
    default, deep paths)."""
    deep = {"type": "", "from": "0xR"}  # falsy type -> 'call'
    node = deep
    for d in range(6):  # 6-deep chain exercises the level loop
        child = {"type": "DELEGATECALL", "from": f"0x{d}", "calls": []}
        node["calls"] = [child, {"type": "CALL", "to": f"0xs{d}"}]
        node = child
    df = spark.createDataFrame(
        [
            (7, "0xtx1", json.dumps(TREE)),
            (8, "0xtx2", None),
            (9, "0xtx3", "not json at all"),
            (10, "0xtx4", json.dumps(deep)),
        ],
        "block_number long, transaction_hash string, trace_json string",
    )
    a = sorted(tuple(r) for r in flatten_geth_traces(df).collect())
    b = sorted(tuple(r) for r in flatten_geth_traces_relational(df).collect())
    assert a == b
    assert len(a) == 4 + 13  # TREE frames + chain frames
    # the single-parse structured variant, both fully in-schema and with the
    # 7-deep chain spilling past a 3-deep schema into the string loop
    c = sorted(tuple(r) for r in flatten_geth_traces_structured(df).collect())
    assert a == c
    d = sorted(
        tuple(r)
        for r in flatten_geth_traces_structured(df, struct_depth=3).collect()
    )
    assert a == d


def test_route_and_status(spark):
    routed = route_trace_fields(flatten_geth_traces(_fixture(spark)))
    rows = {r["trace_address"]: r for r in routed.collect()}
    assert rows["1"]["status_ok"] is False and rows[""]["status_ok"] is True
    assert rows["1,0"]["to_address"] == "0xeee"


def test_genesis_synthetic_rows(spark):
    g = genesis_traces(spark, [("0xAB", "0x1"), ("0xCD", "0x2")])
    rows = g.collect()
    assert len(rows) == 2
    assert all(r["block_number"] == 0 and r["trace_type"] == "genesis" for r in rows)
    assert {r["to_address"] for r in rows} == {"0xab", "0xcd"}


def test_sampled_depth_bound_safe_and_clamped(spark):
    """auto struct_depth: the '"calls"'-count bound never undershoots a
    tree's real depth (count >= depth-1 along any path), clamps to [2,16],
    and an empty/null corpus falls back to the floor."""
    from ethereum_etl_spark.operators.traces import _sampled_depth_bound

    flat = spark.createDataFrame(
        [(1, "0xa", json.dumps({"type": "CALL"}))],
        "block_number long, transaction_hash string, trace_json string",
    )
    assert _sampled_depth_bound(flat, "trace_json", 16) == 2  # floor

    node = {"type": "CALL"}
    for _ in range(30):  # 31-deep chain -> bound must clamp at the cap
        node = {"type": "CALL", "calls": [node]}
    deep = spark.createDataFrame(
        [(1, "0xa", json.dumps(node))],
        "block_number long, transaction_hash string, trace_json string",
    )
    assert _sampled_depth_bound(deep, "trace_json", 16) == 16

    empty = flat.filter("block_number < 0")
    assert _sampled_depth_bound(empty, "trace_json", 16) == 2
    # auto on the deep chain still flattens identically (spill covers the
    # clamped depth overflow)
    a = sorted(tuple(r) for r in flatten_geth_traces(deep).collect())
    b = sorted(
        tuple(r) for r in flatten_geth_traces_structured(deep).collect()
    )
    assert a == b and len(a) == 31
