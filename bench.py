"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: end-to-end CDC replay throughput (change-events/sec) — the
BASELINE.json metric — measured as a full replay of a deterministic
synthetic change log (rows scaled to the SF of $SPARK_GRAFT_SF_DIR) through
normalize -> idempotent bucketed MERGE, plus per-microbatch merge latency.

Also times a representative subset of the __spark_entry__ queries at the
same SF (forced with the noop sink so the full plan executes without
driver-side collection).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32; also used for local[N] master).
"""

from __future__ import annotations

import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from ethereum_etl_spark.plans.merge import MergeTable
from ethereum_etl_spark.plans.replay import replay_range, replay_throughput
from ethereum_etl_spark.session import get_spark
from ethereum_etl_spark.sources.datagen import write_repo_changes

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "latest_event_per_user",
    "running_balance",
    "salted_user_totals",
    "windowed_event_rollup",
    "token_transfer_decode",
    "abi_event_decode",
    "trace_flatten",
    "trace_flatten_kernel",
    "lending_positions",
    "wallet_balance_fold",
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_simhash",
    "dedup_simhash_hamming",
    "dedup_clusters",
    "event_sessionize",
    "text_stats",
    "corpus_prep_pipeline",
    "corpus_pack_sequences",
    "corpus_tokenize",
    "corpus_mix_sample",
    "vocab_train_bpe",
    "encode_bpe",
    "ann_topk_brute",
    "ann_topk_quantized",
    "ann_topk_lsh",
    "ann_topk_ivf_quantized",
    "embedding_near_dup_banded",
    "export_traces",
]

# change-log rows per unit SF: sf0.1 -> 1,000,000 events
ROWS_PER_SF = 10_000_000


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)
    n_rows = max(int(ROWS_PER_SF * sf), 10_000)

    # a bench run materializes several GB of temp change logs/tables;
    # repeated runs filling the disk masquerade as host throttling — clean
    # up this run's artifacts on exit
    import atexit
    import shutil

    _tmp_dirs: list[str] = []

    def _tmpdir(prefix: str) -> str:
        d = tempfile.mkdtemp(prefix=prefix)
        _tmp_dirs.append(d)
        return d

    atexit.register(lambda: [shutil.rmtree(d, ignore_errors=True) for d in _tmp_dirs])

    # 3 shuffle partitions per core: one-per-core leaves stragglers starving
    # cores at the merge-sort tail (measured ~25-35% replay gain at 16-32c)
    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus * 3)
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    # ---- fixture prep (excluded from timing): materialize the change log ----
    log_dir = _tmpdir(prefix="bench_changelog_")
    write_repo_changes(spark, log_dir, n_rows, seed=42, partitions=cpus * 2)

    # ---- headline: full replay (bulk backfill, one merge) ----
    table_root = _tmpdir(prefix="bench_table_")
    table = MergeTable(spark, table_root, n_buckets=cpus * 2)
    t0 = time.time()
    metrics = replay_range(spark, log_dir, table, 0, n_rows - 1, partition_size=None)
    replay_sec = time.time() - t0
    summary = replay_throughput(metrics)

    # ---- merge-apply latency: incremental micro-batches into the same table ----
    micro_root = _tmpdir(prefix="bench_micro_")
    micro = MergeTable(spark, micro_root, n_buckets=cpus * 2)
    batch = max(n_rows // 8, 1)
    t0 = time.time()
    mm = replay_range(
        spark, log_dir, micro, 0, n_rows - 1, partition_size=batch, batch_prefix="micro"
    )
    micro_sec = time.time() - t0
    merge_latency = sum(m.seconds for m in mm) / len(mm)

    # ---- same micro-batches, merge-on-read table (append deltas + compaction) ----
    mor_root = _tmpdir(prefix="bench_mor_")
    mor = MergeTable(spark, mor_root, n_buckets=cpus * 2, mode="mor")
    t0 = time.time()
    mmor = replay_range(
        spark, log_dir, mor, 0, n_rows - 1, partition_size=batch, batch_prefix="mor"
    )
    mor_sec = time.time() - t0
    mor_latency = sum(m.seconds for m in mmor) / len(mmor)
    t0 = time.time()
    mor_rows = mor.read().count()  # read-time winner resolution cost
    mor_read_sec = time.time() - t0
    assert mor_rows == n_rows

    # ---- incremental CDC-out read: after a small tail batch (the steady-
    # state shape of a caught-up stream), changes_since must cost O(changed
    # buckets), not O(table) — buckets_scanned/n_buckets is the pruning
    # ratio, full resolved read is the alternative a consumer avoids
    inc_prev = micro.current_snapshot()["id"]
    replay_range(
        spark, log_dir, micro, 0, 7, partition_size=None, batch_prefix="tail"
    )
    t0 = time.time()
    inc_df = micro.changes_since(inc_prev)
    inc_rows = inc_df.count()
    inc_sec = time.time() - t0
    inc_buckets = len(
        {f.split("__bucket=")[1].split("/")[0]
         for f in inc_df.inputFiles() if "__bucket=" in f}
    )
    t0 = time.time()
    micro.read().count()
    full_read_sec = time.time() - t0

    # ---- MOR compaction under churn: a long micro-batch stream appends a
    # delta file per touched bucket per merge; without compaction read-time
    # winner resolution degrades linearly in merges. This entry marches 24
    # sequential micro-batches through a MOR table (compact_threshold=6,
    # auto_expire_keep=2 so superseded files are vacuumed) and samples the
    # resolved-read latency every 6 batches — the trend must stay flat and
    # the delta chain bounded by the threshold.
    churn_root = _tmpdir(prefix="bench_churn_")
    churn = MergeTable(
        spark, churn_root, n_buckets=16, mode="mor",
        compact_threshold=6, auto_expire_keep=2,
    )
    n_churn = 24
    churn_batch = max(n_rows // 80, 10)
    churn_reads: list[float] = []
    max_chain = 0
    # ---- CdcRelay rides the same churn stream: one poll per micro-batch
    # ships that batch's net delta to a parquet inbox. The scale evidence is
    # O(churn) ship cost: per-poll wall time stays flat and shipped rows
    # track the batch size as the table grows 24x across the stream.
    from ethereum_etl_spark.streaming.relay import CdcRelay

    relay_out = _tmpdir(prefix="bench_relay_")
    relay = CdcRelay(churn, relay_out, os.path.join(relay_out, "cursor.json"))
    relay_polls: list[float] = []
    relay_rows = 0
    relay_overhead_sec = 0.0  # polls + read-back verify, reported separately
    t0 = time.time()
    for i in range(n_churn):
        start = i * churn_batch
        replay_range(
            spark, log_dir, churn, start, start + churn_batch - 1,
            partition_size=None, batch_prefix=f"churn{i}",
        )
        snap = churn.current_snapshot()
        max_chain = max(
            max_chain, max((len(v) for v in snap["buckets"].values()), default=0)
        )
        tp = time.time()
        shipped = relay.poll_once()
        relay_polls.append(round(time.time() - tp, 3))
        assert shipped is not None
        relay_rows += spark.read.parquet(shipped["out"]).count()
        # the relay poll + parquet read-back verify are NOT merge work;
        # accumulate them in their own counter so the churn number measures
        # ingest only (comparable to r3, which had no relay in the loop) and
        # the relay's cost stays visible in the emitted JSON
        relay_overhead_sec += time.time() - tp
        if (i + 1) % 6 == 0:
            tr = time.time()
            churn.read().count()
            churn_reads.append(round(time.time() - tr, 3))
    churn_sec = time.time() - t0 - relay_overhead_sec
    churn_data_dirs = len(os.listdir(os.path.join(churn_root, "data")))

    # ---- salted merge-apply (north rule): bucket-capped regime, where the
    # winner sort's parallelism is capped at n_buckets unless key-salted —
    # 2 buckets stands in for the at-scale reality of TB-sized buckets
    # (sort cost must dominate for the effect to be visible at bench size;
    # measured ~2x reproducibly in this regime, a wash at 64 buckets where
    # the sort is already wide). The datagen's repo churn is heavily skewed
    # by construction (repo 0 carries ~17% of all changes), so this also
    # exercises hot-repo load; same input, same final state, 2 vs 2x16
    # sort partitions.
    t0 = time.time()
    plain_t = MergeTable(spark, _tmpdir(prefix="bench_plain_"), n_buckets=2)
    replay_range(spark, log_dir, plain_t, 0, n_rows - 1, partition_size=None)
    salt_off_sec = time.time() - t0
    t0 = time.time()
    salted_t = MergeTable(
        spark, _tmpdir(prefix="bench_salted_"), n_buckets=2, merge_salts=16
    )
    replay_range(spark, log_dir, salted_t, 0, n_rows - 1, partition_size=None)
    salt_on_sec = time.time() - t0

    # ---- query timings at the SF dir ----
    # soft budget: the sandbox host throttles unpredictably (see BASELINE.md);
    # if the run is badly over budget, skip remaining queries rather than
    # risk the driver's bench window (skips are reported, not silent)
    budget_sec = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "900"))
    bench_start = time.time()
    qfns = entry_mod.queries()
    qsecs: dict[str, float] = {}
    skipped: list[str] = []
    for name in BENCH_QUERIES:
        if time.time() - bench_start > budget_sec:
            skipped.append(name)
            continue
        t0 = time.time()
        df = qfns[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        qsecs[name] = round(time.time() - t0, 3)

    # skipped queries must not make the headline LOOK faster: charge each
    # skip the worst observed query time (floored at 60 s) so a throttled,
    # incomplete run reports a total comparable-or-worse vs a complete one
    skip_penalty = round(
        len(skipped) * max(max(qsecs.values(), default=0.0), 60.0), 3
    ) if skipped else 0.0
    total = round(replay_sec + micro_sec + sum(qsecs.values()) + skip_penalty, 3)
    out = {
        "metric": "cdc_replay_and_query_bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": qsecs,
        "sf": sf,
        "complete": not skipped,
        "skip_penalty_sec": skip_penalty,
        "cdc_replay": {
            "events": n_rows,
            "replay_sec": round(replay_sec, 3),
            "events_per_sec": round(n_rows / replay_sec, 1),
            "micro_batches": len(mm),
            "micro_total_sec": round(micro_sec, 3),
            "merge_latency_avg_sec": round(merge_latency, 3),
            "micro_events_per_sec": round(n_rows / micro_sec, 1),
            "mor_total_sec": round(mor_sec, 3),
            "mor_merge_latency_avg_sec": round(mor_latency, 3),
            "mor_events_per_sec": round(n_rows / mor_sec, 1),
            "mor_resolved_read_sec": round(mor_read_sec, 3),
            "incremental_read": {
                "changed_rows": inc_rows,
                "changes_since_sec": round(inc_sec, 3),
                "buckets_scanned": inc_buckets,
                "n_buckets": micro.n_buckets,
                "full_resolved_read_sec": round(full_read_sec, 3),
            },
            "mor_churn": {
                "micro_batches": n_churn,
                "events_per_batch": churn_batch,
                # ingest-only wall time: relay polls + read-back verify ran
                # inside the same loop but are excluded here and reported
                # under cdc_relay.overhead_sec_total
                "total_sec_excl_relay": round(churn_sec, 3),
                "resolved_read_sec_every_6": churn_reads,
                "max_delta_chain_files": max_chain,
                "compact_threshold": churn.compact_threshold,
                "data_dirs_after_expiry": churn_data_dirs,
            },
            "cdc_relay": {
                "polls": len(relay_polls),
                "poll_sec_each": relay_polls,
                "poll_sec_avg": round(sum(relay_polls) / len(relay_polls), 3),
                "poll_sec_max": round(max(relay_polls), 3),
                "overhead_sec_total": round(relay_overhead_sec, 3),
                "shipped_rows_total": relay_rows,
                "events_ingested": n_churn * churn_batch,
            },
            "salted_merge_demo": {
                "events": n_rows,
                "n_buckets": 2,
                "salt_off_sec": round(salt_off_sec, 3),
                "salt_on_sec": round(salt_on_sec, 3),
                "merge_salts": 16,
            },
        },
        "cpus": cpus,
        "skipped_queries": skipped,
        "engine_summary": summary,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
