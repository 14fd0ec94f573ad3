"""File sinks — the reference's exporter layer, Spark-native.

Reference parity (SURVEY.md §2.8):
- K1 CSV: per-entity file with a fixed field order and header, array columns
  comma-joined (utils/exporters.py:99-159: CsvItemExporter joins lists with
  ',', lazy header from the field list; composite_item_exporter.py:29-76
  routes each item type to its own file via filename_mapping).
- K2 JSON Lines (utils/exporters.py:166-178).
- K7 file-to-file ops (misc_utils.py:75-85) are just read->filter->write.
- P11 converters (blockchainetl/jobs/exporters/converters/*):
  unix_timestamp render to '%Y-%m-%d %H:%M:%S', list->indexed scalar
  columns with ''-fill, int->decimal (a cast).

Scale note: one ``df.write`` per entity — the writers are distributed; the
reference's thread-safe lazy-header file handles (exporters.py:104-118)
are obsoleted by Spark committing part-files + _SUCCESS atomically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _csv_safe(df: DataFrame) -> DataFrame:
    """Render non-scalar columns the way the reference's CSV sink does:
    arrays comma-joined (exporters.py:121-127), maps as k:v pairs."""
    out = df
    for field in df.schema.fields:
        if isinstance(field.dataType, T.ArrayType):
            out = out.withColumn(field.name, F.concat_ws(",", F.col(field.name)))
        elif isinstance(field.dataType, T.MapType):
            pairs = F.transform(
                F.map_entries(F.col(field.name)),
                lambda e: F.concat_ws(":", e["key"], e["value"].cast("string")),
            )
            out = out.withColumn(field.name, F.concat_ws(",", pairs))
    return out


def write_entity_csv(
    df: DataFrame, path: str, fields: list[str] | None = None, single_file: bool = False
) -> None:
    """CSV with header and fixed field order (K1). ``fields`` mirrors the
    reference's FIELDS_TO_EXPORT lists; absent fields default to ''
    (exporters.py:137-138)."""
    out = df
    if fields:
        cols = [
            F.col(f) if f in df.columns else F.lit("").alias(f) for f in fields
        ]
        out = out.select(*cols)
    out = _csv_safe(out)
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").option("header", "true").option("emptyValue", "").csv(path)


def write_entity_jsonl(df: DataFrame, path: str, single_file: bool = False) -> None:
    """JSON Lines (K2): one object per row."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").json(path)


def write_multiplexed(
    entities: dict[str, DataFrame], base_dir: str, fmt: str = "csv"
) -> dict[str, str]:
    """The composite exporter (K1's filename_mapping): each entity type goes
    to its own directory under ``base_dir``."""
    paths: dict[str, str] = {}
    for name, df in entities.items():
        path = f"{base_dir}/{name}"
        if fmt == "csv":
            write_entity_csv(df, path)
        elif fmt == "json":
            write_entity_jsonl(df, path)
        else:
            raise ValueError(f"unknown format {fmt!r}")
        paths[name] = path
    return paths


def render_unix_timestamps(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """P11: render ``*timestamp`` columns as '%Y-%m-%d %H:%M:%S' strings
    (converters/unix_timestamp_item_converter.py). UTC, like the reference's
    datetime.utcfromtimestamp."""
    targets = cols or [f.name for f in df.schema.fields if f.name.endswith("timestamp")]
    # date_format renders in the SESSION timezone, so shift the instant by
    # -offset(session_tz) first (to_utc_timestamp with the *actual* session
    # zone, read from conf) — the rendered wall time is then UTC no matter
    # what zone the session runs in. A literal 'UTC' here would be a no-op
    # shift and silently emit session-local wall time.
    session_tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    out = df
    for c in targets:
        out = out.withColumn(
            c,
            F.date_format(
                F.to_utc_timestamp(F.timestamp_seconds(F.col(c)), session_tz),
                "yyyy-MM-dd HH:mm:ss",
            ),
        )
    return out


def explode_list_column(
    df: DataFrame, col: str, n: int, prefix: str | None = None, fill: str = ""
) -> DataFrame:
    """P11: list column -> ``prefix0..prefix{n-1}`` scalar columns with
    ''-fill for missing positions (converters/list_field_item_converter.py)."""
    prefix = prefix or col
    out = df
    for i in range(n):
        out = out.withColumn(
            f"{prefix}{i}", F.coalesce(F.get(F.col(col), i), F.lit(fill))
        )
    return out.drop(col)
