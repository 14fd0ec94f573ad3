from ethereum_etl_spark.functions.hex import (
    TRANSFER_EVENT_TOPIC,
    hex_to_dec_decimal,
    hex_to_dec_long,
    normalize_address,
    split_to_words,
    word_to_address,
)
from ethereum_etl_spark.functions.text import (
    clean_content,
    quality_score,
    round_timestamp_to_date,
    simple_lang_id,
    text_fingerprint,
    token_count,
    zero_pad,
)

__all__ = [
    "TRANSFER_EVENT_TOPIC",
    "hex_to_dec_decimal",
    "hex_to_dec_long",
    "normalize_address",
    "split_to_words",
    "word_to_address",
    "clean_content",
    "quality_score",
    "round_timestamp_to_date",
    "simple_lang_id",
    "text_fingerprint",
    "token_count",
    "zero_pad",
]
