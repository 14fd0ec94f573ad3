"""P1-P4 entity exports: verbatim reference field lists + mapper semantics."""

from pyspark.sql import functions as F

from ethereum_etl_spark.plans.entities import (
    BLOCK_FIELDS,
    LOG_FIELDS,
    RECEIPT_FIELDS,
    TX_FIELDS,
    export_blocks,
    export_logs,
    export_receipts,
    export_transactions,
    native_transfers,
)

RAW_BLOCK = {
    "number": "0x1b4",
    "hash": "0xh1",
    "parentHash": "0xh0",
    "nonce": "0xn",
    "sha3Uncles": "0xu",
    "logsBloom": "0x00",
    "transactionsRoot": "0xtr",
    "stateRoot": "0xsr",
    "receiptsRoot": "0xrr",
    "miner": "0xABCDEF",
    "difficulty": "0xffffffffffffffffffff",  # > int64
    "totalDifficulty": "0x10",
    "size": "0x220",
    "extraData": "0x",
    "gasLimit": "0x47e7c4",
    "gasUsed": "0x5208",
    "timestamp": "0x5bad55",
    "transactions": [
        {
            "hash": "0xt1", "nonce": "0x1", "transactionIndex": "0x0",
            "from": "0xAA", "to": "0xBB", "value": "0xde0b6b3a7640000",
            "gas": "0x5208", "gasPrice": "0x4a817c800", "input": "0x",
        },
        {
            "hash": "0xt2", "nonce": "0x2", "transactionIndex": "0x1",
            "from": "0xCC", "to": "0xDD", "value": "0x0",
            "gas": "0x5208", "gasPrice": "0x1", "input": "0xdeadbeef",
        },
    ],
}


def _raw(spark):
    return spark.createDataFrame(
        [RAW_BLOCK],
        "number string, hash string, parentHash string, nonce string, "
        "sha3Uncles string, logsBloom string, transactionsRoot string, "
        "stateRoot string, receiptsRoot string, miner string, "
        "difficulty string, totalDifficulty string, size string, "
        "extraData string, gasLimit string, gasUsed string, timestamp string, "
        "transactions array<struct<hash:string,nonce:string,"
        "transactionIndex:string,from:string,to:string,value:string,"
        "gas:string,gasPrice:string,input:string>>",
    )


def test_block_export_fields_and_decode(spark):
    out = export_blocks(_raw(spark))
    assert out.columns == BLOCK_FIELDS  # verbatim exporter field order
    r = out.first()
    assert r["number"] == 436 and r["timestamp"] == 0x5BAD55
    assert r["miner"] == "0xabcdef"  # lowercase-normalized
    assert int(r["difficulty"]) == 0xFFFFFFFFFFFFFFFFFFFF  # exact > int64
    assert r["transaction_count"] == 2 and r["gas_used"] == 21000


def test_transaction_export_inherits_block_context(spark):
    out = export_transactions(_raw(spark))
    assert out.columns == TX_FIELDS
    rows = {r["hash"]: r for r in out.collect()}
    assert len(rows) == 2
    t1 = rows["0xt1"]
    assert t1["block_hash"] == "0xh1" and t1["block_number"] == 436
    assert t1["block_timestamp"] == 0x5BAD55  # inherited from parent block
    assert t1["from_address"] == "0xaa" and int(t1["value"]) == 10**18
    assert native_transfers(out).count() == 1  # only input == '0x'


def test_block_export_golden_csv(spark, tmp_path):
    """Upstream-style golden-file check: exact CSV bytes (field order, hex
    decode, lowercase, decimal rendering) — the reference's fixture-compare
    strategy (SURVEY §5)."""
    import glob

    from ethereum_etl_spark.plans.entities import BLOCK_FIELDS
    from ethereum_etl_spark.sinks import write_entity_csv

    out = str(tmp_path / "golden")
    write_entity_csv(export_blocks(_raw(spark)), out, fields=BLOCK_FIELDS, single_file=True)
    got = open(glob.glob(f"{out}/part-*.csv")[0]).read()
    expected = (
        "number,hash,parent_hash,nonce,sha3_uncles,logs_bloom,"
        "transactions_root,state_root,receipts_root,miner,difficulty,"
        "total_difficulty,size,extra_data,gas_limit,gas_used,timestamp,"
        "transaction_count\n"
        "436,0xh1,0xh0,0xn,0xu,0x00,0xtr,0xsr,0xrr,0xabcdef,"
        "1208925819614629174706175,16,544,0x,4712388,21000,6008149,2\n"
    )
    assert got == expected


def test_receipt_and_log_export_fields(spark):
    receipts = spark.createDataFrame(
        [("0xt1", "0x0", "0xh1", "0x1b4", "0x5208", "0x5208", None, None, "0x1")],
        "transactionHash string, transactionIndex string, blockHash string, "
        "blockNumber string, cumulativeGasUsed string, gasUsed string, "
        "contractAddress string, root string, status string",
    )
    out = export_receipts(receipts)
    assert out.columns == RECEIPT_FIELDS
    assert out.first()["status"] == 1

    logs = spark.createDataFrame(
        [("0x0", "0xt1", "0x0", "0xh1", "0x1b4", "0xAB", "0x00", ["0xT0", "0xT1"])],
        "logIndex string, transactionHash string, transactionIndex string, "
        "blockHash string, blockNumber string, address string, data string, "
        "topics array<string>",
    )
    lout = export_logs(logs)
    assert lout.columns == LOG_FIELDS
    lr = lout.first()
    assert lr["address"] == "0xab" and lr["topics"] == ["0xT0", "0xT1"]


def test_export_traces_field_routing(spark):
    """traces_item_exporter.py field list + trace_mapper.py:146-152 type
    folding: selfdestruct->suicide, call family -> (call, call_type)."""
    import json

    from ethereum_etl_spark.operators.traces import flatten_geth_traces
    from ethereum_etl_spark.plans.entities import TRACE_EXPORT_FIELDS, export_traces

    tree = {
        "type": "DELEGATECALL", "from": "0xA", "to": "0xB", "value": "0xff",
        "gas": "0x100", "gasUsed": "0x80", "input": "0xdead", "output": "0xbeef",
        "calls": [
            {"type": "SELFDESTRUCT", "from": "0xB", "to": "0xC"},
            {"type": "CREATE", "from": "0xB", "to": "0xD"},
        ],
    }
    df = spark.createDataFrame(
        [(5, "0xtx", json.dumps(tree))],
        "block_number long, transaction_hash string, trace_json string",
    )
    out = export_traces(flatten_geth_traces(df))
    assert set(out.columns) == set(TRACE_EXPORT_FIELDS)
    rows = {r["trace_address"]: r for r in out.collect()}
    root = rows[""]
    assert root["trace_type"] == "call" and root["call_type"] == "delegatecall"
    assert root["value"] == 255 and root["gas"] == 256 and root["gas_used"] == 128
    assert root["input"] == "0xdead" and root["output"] == "0xbeef"
    assert rows["0"]["trace_type"] == "suicide" and rows["0"]["call_type"] is None
    assert rows["1"]["trace_type"] == "create"
    assert all(r["status"] is None and r["trace_id"] is None for r in rows.values())


def test_export_contracts_fields(spark):
    from ethereum_etl_spark.operators.contracts import classify_contracts
    from ethereum_etl_spark.plans.entities import CONTRACT_FIELDS, export_contracts

    raw = spark.createDataFrame(
        [("0xAbC", "0x" + "63" + "18160ddd" + "63" + "70a08231" + "63" + "a9059cbb", 7)],
        "address string, bytecode string, block_number long",
    )
    out = export_contracts(classify_contracts(raw))
    assert out.columns == CONTRACT_FIELDS
    r = out.first()
    assert r["address"] == "0xabc" and r["is_erc20"] and not r["is_erc721"]
    assert "0x18160ddd" in r["function_sighashes"]
