"""S9/J2 lending math: exact half-even quotient + position joins."""

from pyspark.sql import functions as F

from ethereum_etl_spark.operators.lending import (
    pool_positions,
    round_half_even_div,
    vtoken_positions,
)


def test_round_half_even_matches_python(spark):
    from fractions import Fraction

    from decimal import Decimal

    cases = [(7, 2), (5, 2), (1, 3), (2, 3), (10**20 + 1, 2), (3, 2), (9, 6), (15, 6)]
    df = spark.createDataFrame(
        [(Decimal(n), Decimal(d)) for n, d in cases], "n decimal(38,0), d decimal(38,0)"
    )
    out = df.select("n", "d", round_half_even_div(F.col("n"), F.col("d")).alias("q")).collect()
    for r in out:
        # Python round() on Fraction is exact banker's rounding at any size
        assert int(r["q"]) == round(Fraction(int(r["n"]), int(r["d"]))), (r["n"], r["d"])
    got = {(int(r["n"]), int(r["d"])): int(r["q"]) for r in out}
    assert got[(7, 2)] == 4  # 3.5 -> 4 (even)
    assert got[(5, 2)] == 2  # 2.5 -> 2 (even)
    assert got[(3, 2)] == 2  # 1.5 -> 2
    assert got[(9, 6)] == 2  # 1.5 -> 2
    assert got[(15, 6)] == 2  # 2.5 -> 2
    assert got[(1, 3)] == 0 and got[(2, 3)] == 1


def test_vtoken_positions_exact(spark):
    # supply 100 underlying at rate 2e18 (i.e. 2.0) -> 50 tokens
    df = spark.createDataFrame(
        [("0xVT", "0xAB", 5, 100, 7, 2 * 10**18)],
        "contract_address string, address string, block_number long, "
        "supply_raw long, borrow_raw long, exchange_rate_raw long",
    )
    r = vtoken_positions(df).first()
    assert int(r["supply"]) == 50 and int(r["borrow"]) == 4  # 3.5 -> 4
    assert r["contract_address"] == "0xvt" and r["unit_token"] == "0xvt"


def test_pool_positions_asof_lag(spark):
    balances = spark.createDataFrame(
        [("0xw1", "0xasset", 10, 100, 7, 3), ("0xw1", "0xasset", 20, 120, 8, 2)],
        "address string, asset_address string, block_number long, "
        "balance long, supply long, borrow long",
    )
    reserves = spark.createDataFrame(
        [("0xasset", "0xtt", "0xdt")],
        "asset_address string, t_token_address string, debt_token_address string",
    )
    rows = {r["block_number"]: r for r in pool_positions(balances, reserves).collect()}
    assert rows[10]["pre_balance"] is None and rows[20]["pre_balance"] == 100
    assert rows[20]["t_token_address"] == "0xtt" and rows[20]["unit_token"] == "0xasset"
