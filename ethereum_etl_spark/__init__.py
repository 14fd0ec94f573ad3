"""ethereum_etl_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch rebuild of the capabilities of ``thanhnv2303/ethereum-etl``
(reference at /root/reference, surveyed in SURVEY.md): the chain-tail loop
becomes an incremental micro-batch source over a change-event log
``repo_changes(seq, repo, path, commit, lang, content)``; the mapper
pipeline becomes vectorized column expressions + pandas UDFs; the Mongo
upsert sink becomes an idempotent, key-bucketed MERGE INTO on a
parquet-backed lakehouse table (Iceberg-style snapshot manifests — the
production target is Iceberg `MERGE INTO`; this repo ships a self-contained
implementation because no Iceberg runtime jar is available in the sandbox).

Subpackages
-----------
sources/    change-log generation, readers, chain-tail offset manager
functions/  scalar function library (hex decode, address/text normalize, sketches)
operators/  decoders, stateful balances, dedup, similarity, text, multimodal
plans/      normalize stage, merge-table sink, batch replay driver
streaming/  micro-batch streamer (lag, batch cap, checkpoint), metrics
"""

__version__ = "0.1.0"
