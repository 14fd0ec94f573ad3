from ethereum_etl_spark.operators.balances import as_of_previous, balance_map_fold, running_balances
from ethereum_etl_spark.operators.transfers import extract_token_transfers
from ethereum_etl_spark.operators.skew import salted_aggregate

__all__ = [
    "extract_token_transfers",
    "running_balances",
    "balance_map_fold",
    "as_of_previous",
    "salted_aggregate",
]
