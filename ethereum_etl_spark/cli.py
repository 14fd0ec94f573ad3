"""Operational CLI — the spark-submit entry surface.

On a cluster:

    spark-submit --py-files ethereum_etl_spark.zip -m ethereum_etl_spark.cli ...

locally:

    python -m ethereum_etl_spark.cli datagen --out /tmp/log --rows 1000000
    python -m ethereum_etl_spark.cli replay  --source /tmp/log --table /tmp/t \
        --start 0 --end 999999 [--partition-size 100000] [--mode mor]
    python -m ethereum_etl_spark.cli stream  --source /tmp/log --table /tmp/t \
        --checkpoint /tmp/ck [--lag 100] [--batch-size 100000] [--seconds 60]
    python -m ethereum_etl_spark.cli latest-state --table /tmp/t --out /tmp/latest

The reference's quick_run/build_knowledge_graph.py CLI flags map 1:1:
--start-block/--lag/--period-seconds/--block-batch-size ->
--start/--lag/--poll-seconds/--batch-size (streamer.py:40-58).
"""

from __future__ import annotations

import argparse
import json
import sys

from ethereum_etl_spark.plans.merge import MergeTable
from ethereum_etl_spark.plans.replay import replay_range, replay_throughput
from ethereum_etl_spark.session import get_spark
from ethereum_etl_spark.sources.datagen import write_repo_changes
from ethereum_etl_spark.sources.tail import TailSource
from ethereum_etl_spark.streaming.stream import Streamer


def _table(spark, args) -> MergeTable:
    return MergeTable(
        spark, args.table, n_buckets=args.buckets, mode=getattr(args, "mode", "cow"),
        merge_salts=getattr(args, "merge_salts", 1),
    )


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="ethereum_etl_spark")
    p.add_argument("--master", default=None, help="spark master (default local[$SPARK_GRAFT_CPUS])")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("datagen", help="materialize a synthetic change log")
    g.add_argument("--out", required=True)
    g.add_argument("--rows", type=int, required=True)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--partitions", type=int, default=None)

    r = sub.add_parser("replay", help="batch replay a seq range into the table")
    r.add_argument("--source", required=True)
    r.add_argument("--table", required=True)
    r.add_argument("--start", type=int, required=True)
    r.add_argument("--end", type=int, required=True)
    r.add_argument("--partition-size", type=int, default=None)
    r.add_argument("--buckets", type=int, default=32)
    r.add_argument("--mode", choices=["cow", "mor"], default="cow")
    r.add_argument("--merge-salts", type=int, default=1,
                   help="sub-partition the merge sort (buckets*salts ~ cores*k)")

    s = sub.add_parser("stream", help="tail the change log with checkpointed micro-batches")
    s.add_argument("--source", required=True)
    s.add_argument("--table", required=True)
    s.add_argument("--checkpoint", required=True)
    s.add_argument("--start", type=int, default=None)
    s.add_argument("--lag", type=int, default=0)
    s.add_argument("--batch-size", type=int, default=100_000)
    s.add_argument("--poll-seconds", type=float, default=2.0)
    s.add_argument("--seconds", type=float, default=60.0)
    s.add_argument("--buckets", type=int, default=32)
    s.add_argument("--mode", choices=["cow", "mor"], default="mor")
    s.add_argument("--merge-salts", type=int, default=1,
                   help="sub-partition the merge sort (buckets*salts ~ cores*k)")

    latest = sub.add_parser("latest-state", help="export the latest-commit-per-path view")
    latest.add_argument("--table", required=True)
    latest.add_argument("--out", required=True)
    latest.add_argument("--buckets", type=int, default=32)

    args = p.parse_args(argv)
    spark = get_spark("ethereum-etl-spark-cli", master=args.master)

    if args.cmd == "datagen":
        write_repo_changes(spark, args.out, args.rows, seed=args.seed, partitions=args.partitions)
        print(json.dumps({"written": args.rows, "out": args.out}))
    elif args.cmd == "replay":
        metrics = replay_range(
            spark, args.source, _table(spark, args), args.start, args.end,
            partition_size=args.partition_size,
        )
        print(json.dumps(replay_throughput(metrics)))
    elif args.cmd == "stream":
        src = TailSource(spark, args.source, lag=args.lag, batch_size=args.batch_size)
        streamer = Streamer(
            spark, src, _table(spark, args), args.checkpoint,
            start_seq=args.start, poll_seconds=args.poll_seconds,
        )
        metrics = streamer.stream(max_seconds=args.seconds)
        print(json.dumps({
            "cycles": len(metrics),
            "rows": sum(m.rows_in for m in metrics),
            "last_synced": streamer.last_synced(),
        }))
    elif args.cmd == "latest-state":
        _table(spark, args).latest_state().write.mode("overwrite").parquet(args.out)
        print(json.dumps({"out": args.out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
