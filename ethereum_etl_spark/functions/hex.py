"""Hex / address scalar functions — the reference's UDF surface, vectorized.

Reference semantics (SURVEY.md §2.10):
- ``hex_to_dec``            utils/utils.py:30-37        int(x, 16), unbounded
- ``to_normalized_address`` utils/utils.py:55-58        lowercase hex string
- ``chunk_string``          utils/utils.py:51-52        fixed-width splits
- ``word_to_address``       token_transfer_extractor.py:75-81  last 40 hex chars
- ``split_to_words``        token_transfer_extractor.py:66-72  64-char words

Everything that fits in 64 bits stays a native column expression
(whole-stage-codegen'd, JVM-side). Only the unbounded uint256 decode needs a
pandas UDF (``F.conv`` silently truncates beyond 64 bits) — Arrow-batched,
never row-at-a-time Python.
"""

from __future__ import annotations

from decimal import Decimal

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# keccak256("Transfer(address,address,uint256)") — constant precomputed on the
# driver in the reference too (token_transfer_extractor.py:31)
TRANSFER_EVENT_TOPIC = "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"


def strip_0x(col: Column) -> Column:
    """Remove an optional 0x prefix (pure column op)."""
    return F.regexp_replace(col, "^0x", "")


def hex_to_dec_long(col: Column) -> Column:
    """Hex string (optionally 0x-prefixed) → BIGINT. Safe for values < 2^63.

    Native ``conv(x, 16, 10)`` — JVM-side, codegen'd. Use for block numbers,
    gas, indices (reference: hex_to_dec at utils/utils.py:30-37 applied to
    small fields in block_mapper.py:36-65).
    """
    return F.conv(strip_0x(col), 16, 10).cast("long")


@F.pandas_udf(T.DecimalType(38, 0))
def hex_to_dec_decimal(s: pd.Series) -> pd.Series:
    """Hex string → Decimal(38,0), exact beyond 64 bits (uint256 values).

    Arrow-vectorized pandas UDF; the reference decodes with Python
    ``int(x, 16)`` (utils/utils.py:30-37) and stringifies at sinks
    (knowledge_graph_exporter.py:59-97). Values exceeding 38 digits are
    capped to None (the durable truth for full parity is the canonical
    hex string column, kept alongside).
    """

    def conv(x):
        if x is None or x == "":
            return None
        try:
            v = int(x, 16)
        except ValueError:
            return None
        return Decimal(v) if v < 10**38 else None

    return s.map(conv)


_CHUNK = 11  # hex digits per conv() chunk: 44 bits, safely inside int64
_CHUNK_BASE = 16 ** _CHUNK


def hex_to_dec_native(col: Column) -> Column:
    """Hex string (optionally 0x-prefixed) → DECIMAL(38,0), pure JVM ops.

    Splits the significant digits into three 11-hex chunks, each decoded
    with native ``conv`` (exact at 44 bits), recombined with exact decimal
    arithmetic — no Python worker in the pipeline. Values needing more than
    31 significant hex digits (≥16^31 ≈ 2.1e37) return NULL, mirroring the
    pandas decoder's Decimal(38,0) cap; the canonical hex string column
    remains the durable truth for such values (reference stringifies
    everywhere, knowledge_graph_exporter.py:59-97).
    """
    sig = F.regexp_replace(strip_0x(col), "^0+", "")
    z = F.lpad(sig, 3 * _CHUNK, "0")
    c2 = F.conv(F.substring(z, 1, _CHUNK), 16, 10).cast("long")
    c1 = F.conv(F.substring(z, _CHUNK + 1, _CHUNK), 16, 10).cast("long")
    c0 = F.conv(F.substring(z, 2 * _CHUNK + 1, _CHUNK), 16, 10).cast("long")
    base = F.lit(_CHUNK_BASE).cast("decimal(38,0)")
    val = (c2.cast("decimal(38,0)") * base + c1) * base + c0
    bad = (
        col.isNull()
        | (F.length(strip_0x(col)) == 0)
        | (F.length(sig) > 3 * _CHUNK - 2)
        | ~strip_0x(col).rlike("^[0-9a-fA-F]+$")
    )
    return F.when(bad, F.lit(None).cast("decimal(38,0)")).otherwise(
        val.cast("decimal(38,0)")
    )


def normalize_address(col: Column) -> Column:
    """Lowercase-normalize an address/hash (utils/utils.py:55-58)."""
    return F.lower(col)


def word_to_address(word: Column) -> Column:
    """32-byte hex word → 0x + last 40 hex chars, lowercased.

    Reference: token_transfer_extractor.py:75-81. Pure substring arithmetic —
    no UDF needed.
    """
    bare = strip_0x(word)
    return F.when(
        F.length(bare) >= 40,
        F.concat(F.lit("0x"), F.lower(F.substring(bare, -40, 40))),
    ).otherwise(F.when(word.isNotNull(), F.lower(word)))


def split_to_words(data: Column) -> Column:
    """Hex payload → array of 0x-prefixed 64-char words.

    Reference: token_transfer_extractor.py:66-72 (chunk_string at
    utils/utils.py:51-52). Expressed as transform() over a sequence of
    offsets — stays JVM-side, no Python.
    """
    bare = strip_0x(data)
    n_words = (F.length(bare) / 64).cast("int")
    return F.when(F.length(bare) >= 64, F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda i: F.concat(F.lit("0x"), F.substring(bare, (i * 64 + 1).cast("int"), 64)),
    )).otherwise(F.array().cast("array<string>"))
