from ethereum_etl_spark.sinks.exporters import (  # noqa: F401
    explode_list_column,
    render_unix_timestamps,
    write_entity_csv,
    write_entity_jsonl,
    write_multiplexed,
)
