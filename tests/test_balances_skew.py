"""Stateful balances (A3/A4/J6) and salted aggregation — vs Python oracles."""

from collections import defaultdict
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from ethereum_etl_spark.operators.balances import (
    as_of_previous,
    balance_map_fold,
    fold_batch_totals,
    running_balances,
    transfers_to_deltas,
)
from ethereum_etl_spark.operators.skew import salted_aggregate

TRANSFERS = [
    # token, from, to, value, block, log_index
    ("0xtok1", "0xa", "0xb", Decimal(100), 1, 0),
    ("0xtok1", "0xb", "0xc", Decimal(30), 1, 1),
    ("0xtok1", "0xa", "0xc", Decimal(50), 2, 0),
    ("0xtok2", "0xc", "0xa", Decimal(7), 2, 1),
    ("0xtok1", "0xc", "0xa", Decimal(80), 3, 0),
]
SCHEMA = (
    "token_address string, from_address string, to_address string, "
    "value decimal(38,0), block_number long, log_index long"
)


@pytest.fixture(scope="module")
def transfers(spark):
    return spark.createDataFrame(TRANSFERS, SCHEMA)


def _oracle_balances():
    bal = defaultdict(int)
    hist = []
    for tok, src, dst, v, blk, li in TRANSFERS:
        for addr, sgn in ((src, -1), (dst, +1)):
            old = bal[(addr, tok)]
            bal[(addr, tok)] += sgn * v
            hist.append((addr, tok, blk, li, sgn * v, old, bal[(addr, tok)]))
    return bal, hist


def test_running_balances_match_oracle(transfers):
    out = running_balances(transfers_to_deltas(transfers)).collect()
    oracle, hist = _oracle_balances()
    got = {(r["address"], r["token_address"], r["block_number"], r["log_index"], int(r["delta"])): (
        int(r["old_balance"]), int(r["new_balance"])) for r in out}
    assert len(out) == len(hist) == 2 * len(TRANSFERS)
    for addr, tok, blk, li, delta, old, new in hist:
        assert got[(addr, tok, blk, li, delta)] == (old, new)


def test_balance_map_fold(transfers):
    wallets = {r["address"]: r for r in balance_map_fold(
        running_balances(transfers_to_deltas(transfers))).collect()}
    oracle, _ = _oracle_balances()
    assert wallets["0xa"]["balance"] == {"0xtok1": str(oracle[("0xa", "0xtok1")]),
                                         "0xtok2": str(oracle[("0xa", "0xtok2")])}
    assert wallets["0xa"]["at_block_number"] == 3
    assert wallets["0xb"]["balance"]["0xtok1"] == "70"


def test_fold_batch_totals(transfers):
    totals = {(r["address"], r["token_address"]): int(r["delta"])
              for r in fold_batch_totals(transfers_to_deltas(transfers)).collect()}
    oracle, _ = _oracle_balances()
    assert totals == {k: v for k, v in oracle.items()}


def test_as_of_previous(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 15.0), ("b", 1, 5.0)],
        "key string, seq long, v double",
    )
    out = {(r["key"], r["seq"]): r["prev_v"] for r in as_of_previous(df, ["key"], ["seq"], "v").collect()}
    assert out[("a", 1)] is None and out[("a", 2)] == 10.0 and out[("a", 3)] == 20.0
    assert out[("b", 1)] is None


def test_salted_aggregate_equals_plain(spark):
    from ethereum_etl_spark.sources.datagen import generate_repo_changes

    df = generate_repo_changes(spark, 3000, seed=42)
    salted = salted_aggregate(
        df, ["repo"],
        {"n": ("count", "seq"), "max_seq": ("max", "seq"), "sum_seq": ("sum", "seq")},
        n_salts=8, salt_source="path",
    )
    plain = df.groupBy("repo").agg(
        F.count("seq").alias("n"), F.max("seq").alias("max_seq"), F.sum("seq").alias("sum_seq")
    )
    a = {r["repo"]: (r["n"], r["max_seq"], r["sum_seq"]) for r in salted.collect()}
    b = {r["repo"]: (r["n"], r["max_seq"], r["sum_seq"]) for r in plain.collect()}
    assert a == b
