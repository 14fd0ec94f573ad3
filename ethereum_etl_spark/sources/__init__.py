from ethereum_etl_spark.sources.datagen import CHANGE_LOG_SCHEMA, generate_repo_changes
from ethereum_etl_spark.sources.tail import TailSource

__all__ = ["CHANGE_LOG_SCHEMA", "generate_repo_changes", "TailSource"]
