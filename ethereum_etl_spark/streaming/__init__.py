from ethereum_etl_spark.streaming.stream import Streamer

__all__ = ["Streamer"]
