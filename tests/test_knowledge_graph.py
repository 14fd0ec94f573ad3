"""Flagship composite pipeline: all entity tables from one pass, wallet
read-modify-write accumulation, exactly-once replay."""

from pyspark.sql import functions as F

from ethereum_etl_spark.functions.hex import TRANSFER_EVENT_TOPIC
from ethereum_etl_spark.plans.knowledge_graph import (
    KnowledgeGraphTables,
    export_knowledge_graph,
    wallet_map_view,
)

RAW_SCHEMA = (
    "number string, hash string, parentHash string, nonce string, "
    "sha3Uncles string, logsBloom string, transactionsRoot string, "
    "stateRoot string, receiptsRoot string, miner string, difficulty string, "
    "totalDifficulty string, size string, extraData string, gasLimit string, "
    "gasUsed string, timestamp string, transactions array<struct<hash:string,"
    "nonce:string,transactionIndex:string,from:string,to:string,value:string,"
    "gas:string,gasPrice:string,input:string>>"
)

LOG_SCHEMA = (
    "address string, topics array<string>, data string, "
    "transaction_hash string, log_index long, block_number long"
)


def _raw_block(n, txs):
    h = lambda s: f"0x{s}{n:04x}"  # noqa: E731
    return (
        hex(n), h("b"), h("p"), "0x1", h("u"), "0x00", h("t"), h("s"), h("r"),
        "0xMINER", "0x10", "0x20", "0x100", "0x", "0x100", "0x80", hex(1600000000 + n), txs,
    )


def _tx(i):
    return (f"0xtx{i}", "0x1", hex(i), "0xAA", "0xBB", "0x5", "0x100", "0x10", "0x")


def _transfer_log(i, block, frm, to, value_hex, word64=True):
    pad = lambda s: "0x" + s.rjust(64, "0")  # noqa: E731
    return (
        "0xT0KEN",
        [TRANSFER_EVENT_TOPIC, pad(frm), pad(to)],
        pad(value_hex),
        f"0xlogtx{i}",
        i,
        block,
    )


def _cycle_inputs(spark, blocks_range, log_ids, block_of):
    raw_blocks = spark.createDataFrame(
        [_raw_block(n, [_tx(n * 10 + j) for j in range(2)]) for n in blocks_range],
        RAW_SCHEMA,
    )
    logs = spark.createDataFrame(
        [_transfer_log(i, block_of(i), "aa" * 20, "bb" * 20, "64") for i in log_ids],
        LOG_SCHEMA,
    )
    return raw_blocks, logs


def test_two_cycles_accumulate_and_replay_noop(spark, tmp_path):
    tables = KnowledgeGraphTables.create(spark, str(tmp_path / "klg"), n_buckets=4)

    raw1, logs1 = _cycle_inputs(spark, range(0, 3), [0, 1], lambda i: i)
    r1 = export_knowledge_graph(raw1, logs1, tables, batch_id="c1")
    assert r1.rows()["blocks"] == 3 and r1.rows()["transactions"] == 6
    assert r1.rows()["token_transfers"] == 2

    # wallet state after cycle 1: 0xaa..a lost 2*0x64, 0xbb..b gained 2*0x64
    state = {
        (r["address"], r["token_address"]): int(r["balance"])
        for r in tables.wallets.read().collect()
    }
    frm, to = "0x" + "aa" * 20, "0x" + "bb" * 20
    assert state[(frm, "0xt0ken")] == -200 and state[(to, "0xt0ken")] == 200

    # cycle 2 accumulates on top of cycle 1 (read-modify-write J4)
    raw2, logs2 = _cycle_inputs(spark, range(3, 5), [2], lambda i: i)
    export_knowledge_graph(raw2, logs2, tables, batch_id="c2")
    state2 = {
        (r["address"], r["token_address"]): int(r["balance"])
        for r in tables.wallets.read().collect()
    }
    assert state2[(frm, "0xt0ken")] == -300 and state2[(to, "0xt0ken")] == 300
    assert tables.blocks.read().count() == 5

    # crash-replay: re-running cycle 2 with the same batch id is a no-op —
    # balances do NOT double-count (exactly-once effective)
    r2b = export_knowledge_graph(raw2, logs2, tables, batch_id="c2")
    assert all(m.noop for m in r2b.metrics.values())
    state3 = {
        (r["address"], r["token_address"]): int(r["balance"])
        for r in tables.wallets.read().collect()
    }
    assert state3 == state2

    # map-shaped wallet view (the reference's Mongo doc shape)
    view = {r["address"]: r for r in wallet_map_view(tables).collect()}
    assert view[to]["balance"] == {"0xt0ken": "300"}
    assert view[to]["at_block_number"] == 2


def test_capability_flag_skips_transfer_path(spark, tmp_path):
    """F8: log_filter_supported=False skips transfer extraction and the
    wallet accumulate — blocks/txs still export (reference gate around
    ExportTokenTransfersJob, export_knowledge_graph_needed_common.py:109)."""
    from ethereum_etl_spark.plans.knowledge_graph import is_log_filter_supported

    assert is_log_filter_supported("http://archive-node:8545")
    assert not is_log_filter_supported("https://mainnet.infura.io/v3/k")

    blocks = spark.createDataFrame([_raw_block(1, [_tx(0)])], RAW_SCHEMA)
    logs = spark.createDataFrame(
        [_transfer_log(0, 1, "aa" * 20, "bb" * 20, "5")], LOG_SCHEMA
    )
    tables = KnowledgeGraphTables.create(spark, str(tmp_path / "klg"), n_buckets=2)
    out = export_knowledge_graph(
        blocks, logs, tables, batch_id="gated", log_filter_supported=False
    )
    assert "blocks" in out.metrics and "transactions" in out.metrics
    assert "token_transfers" not in out.metrics and "wallets" not in out.metrics
    assert tables.wallets.current_snapshot() is None
    # with the capability present, the same cycle produces transfers+wallets
    out2 = export_knowledge_graph(blocks, logs, tables, batch_id="full")
    assert out2.metrics["token_transfers"].rows_in == 1
    assert wallet_map_view(tables).count() == 2
