"""Lending-position math — S9/J2 as exact decimal arithmetic + joins.

Reference: ``EthLendingService``
(/root/reference/ethereumetl/service/eth_lending_service.py:74-188):
- vToken path (:101-111): exchange_rate = exchangeRateCurrent / 1e18, then
  supply = round(balanceOfUnderlying / exchange_rate) and
  borrow = round(borrowBalanceCurrent / exchange_rate) — Python ``round``,
  i.e. HALF-EVEN (banker's) rounding on the quotient.
- pool path (:125-188): reserve lookup (asset -> tToken/debtToken addresses)
  then per-address balance reads, pre_balance at block-1.

Spark-first: the point RPC reads become columns of a positions table; the
quotient is computed with EXACT integer/decimal arithmetic (never float):

    round_half_even(n / d) over DECIMAL(38,0)

using only +, *, pmod and a remainder-subtracted division whose result is an
exact integer (a raw decimal division would round at Spark's result scale
and could flip the quotient at boundaries — subtracting ``pmod(n, d)`` first
makes the numerator divisible, so the quotient is exact in any engine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

D38 = "decimal(38,0)"
EXCHANGE_RATE_DECIMALS = 18  # VTokenConstant.EXCHANGE_RATE_DECIMALS


def exact_floor_div(n: Column, d: Column) -> Column:
    """floor(n/d) for non-negative DECIMAL(38,0) operands, exact in any
    engine: the remainder is subtracted first so the division is integral."""
    return ((n - F.pmod(n, d)) / d).cast(D38)


def round_half_even_div(n: Column, d: Column) -> Column:
    """Python ``round(n/d)`` (banker's) for non-negative decimals — the
    reference's quotient rounding, bit-for-bit."""
    f = exact_floor_div(n, d)
    rem2 = F.pmod(n, d) * F.lit(2).cast(D38)
    round_up = (rem2 > d) | ((rem2 == d) & (F.pmod(f, F.lit(2).cast(D38)) == 1))
    return f + F.when(round_up, F.lit(1)).otherwise(F.lit(0)).cast(D38)


def vtoken_positions(positions: DataFrame) -> DataFrame:
    """vToken path: (contract_address, address, supply_raw, borrow_raw,
    exchange_rate_raw) -> normalized supply/borrow in token units.

    supply = round_half_even(supply_raw * 10^18 / exchange_rate_raw), the
    exact-arithmetic form of `round(balanceOfUnderlying / (rate/1e18))`
    (eth_lending_service.py:104-111)."""
    scale = F.lit(10 ** EXCHANGE_RATE_DECIMALS).cast(D38)
    sup_n = F.col("supply_raw").cast(D38) * scale
    bor_n = F.col("borrow_raw").cast(D38) * scale
    rate = F.col("exchange_rate_raw").cast(D38)
    return positions.select(
        F.lower(F.col("contract_address")).alias("contract_address"),
        F.lower(F.col("address")).alias("address"),
        *[c for c in ["block_number"] if c in positions.columns],
        round_half_even_div(sup_n, rate).alias("supply"),
        round_half_even_div(bor_n, rate).alias("borrow"),
        F.lower(F.col("contract_address")).alias("unit_token"),
    )


def pool_positions(
    balances: DataFrame, reserves: DataFrame, order_col: str = "block_number"
) -> DataFrame:
    """Pool path: broadcast the reserve dim (asset -> tToken/debtToken,
    eth_lending_service.py:148-152), join per-address balances, derive
    pre_balance as the previous balance per (address, asset) — the as-of
    lag that replaces the block-1 point read (:176-177)."""
    w = Window.partitionBy("address", "asset_address").orderBy(order_col)
    return (
        balances.join(F.broadcast(reserves), "asset_address", "left")
        .withColumn("pre_balance", F.lag("balance").over(w))
        .select(
            F.lower(F.col("address")).alias("address"),
            F.lower(F.col("asset_address")).alias("unit_token"),
            "t_token_address",
            "debt_token_address",
            "balance",
            "pre_balance",
            "supply",
            "borrow",
            order_col,
        )
    )
