from ethereum_etl_spark.plans.merge import MergeTable
from ethereum_etl_spark.plans.normalize import normalize_changes
from ethereum_etl_spark.plans.replay import replay_range

__all__ = ["MergeTable", "normalize_changes", "replay_range"]
