"""Decoder golden tests — D1 transfer decode, D2 ABI event decode, D4/D5
contract classification (SURVEY.md §2.4), mirroring the reference's
golden-fixture style with hand-built logs."""

import pytest
from pyspark.sql import functions as F

from ethereum_etl_spark.functions.hex import TRANSFER_EVENT_TOPIC
from ethereum_etl_spark.operators.contracts import classify_contracts
from ethereum_etl_spark.operators.events import EventAbi, AbiInput, address_fields, decode_events, load_abi
from ethereum_etl_spark.operators.transfers import extract_token_transfers

LOGS_SCHEMA = (
    "address string, topics array<string>, data string, "
    "transaction_hash string, log_index long, block_number long"
)


def _word_addr(addr: str) -> str:
    return "0x" + addr[2:].rjust(64, "0")


def _word_int(v: int) -> str:
    return "0x" + format(v, "x").rjust(64, "0")


A1 = "0x" + "aa" * 20
A2 = "0x" + "bb" * 20
TOKEN = "0x" + "CC" * 20  # mixed case in, lowercased out
BIG = 2**96 + 12345  # > uint64


@pytest.fixture(scope="module")
def logs(spark):
    rows = [
        # indexed layout: from/to in topics, value in data (the common ERC-20)
        (TOKEN, [TRANSFER_EVENT_TOPIC, _word_addr(A1), _word_addr(A2)], _word_int(BIG), "0xt1", 0, 100),
        # unindexed layout: everything in data words
        (TOKEN, [TRANSFER_EVENT_TOPIC], "0x" + _word_addr(A1)[2:] + _word_addr(A2)[2:] + _word_int(7)[2:], "0xt2", 1, 100),
        # malformed: word count != 4 → dropped (token_transfer_extractor.py:48-51)
        (TOKEN, [TRANSFER_EVENT_TOPIC, _word_addr(A1)], "0x", "0xt3", 2, 100),
        # empty topics → dropped (:38-41)
        (TOKEN, [], "0x", "0xt4", 3, 100),
        # different topic0 → not a transfer
        (TOKEN, ["0x" + "11" * 32, _word_addr(A1), _word_addr(A2)], _word_int(5), "0xt5", 4, 101),
    ]
    return spark.createDataFrame(rows, LOGS_SCHEMA)


def test_transfer_decode_golden(logs):
    out = {r["transaction_hash"]: r for r in extract_token_transfers(logs).collect()}
    assert set(out) == {"0xt1", "0xt2"}
    t1 = out["0xt1"]
    assert t1["token_address"] == TOKEN.lower()
    assert t1["from_address"] == A1 and t1["to_address"] == A2
    assert int(t1["value"]) == BIG  # exact uint256-scale decode
    assert t1["value_hex"] == _word_int(BIG).lower()
    assert out["0xt2"]["to_address"] == A2 and int(out["0xt2"]["value"]) == 7


def test_transfer_token_filter(logs, spark):
    assert extract_token_transfers(logs, token_filter=[TOKEN]).count() == 2
    assert extract_token_transfers(logs, token_filter=["0x" + "99" * 20]).count() == 0
    dim = spark.createDataFrame([(TOKEN.lower(),)], "address string")
    assert extract_token_transfers(logs, token_filter=dim).count() == 2


MINT_ABI = {
    "name": "Mint",
    "inputs": [
        {"name": "minter", "type": "address", "indexed": True},
        {"name": "mintAmount", "type": "uint256", "indexed": False},
        {"name": "mintTokens", "type": "uint256", "indexed": False},
    ],
    "saveName": "mint_events",
}


def test_abi_event_decode(spark):
    abi = load_abi(MINT_ABI)
    assert abi.signature == "Mint(address,uint256,uint256)"
    assert address_fields(abi) == ["minter"]
    rows = [
        ("0xC0NTRACT", [abi.topic0, _word_addr(A1)], "0x" + _word_int(1000)[2:] + _word_int(BIG)[2:], "0xe1", 0, 50),
        ("0xC0NTRACT", [abi.topic0, _word_addr(A1)], "0x" + _word_int(1)[2:], "0xe2", 1, 50),  # malformed: 2 words, need 3
    ]
    logs = spark.createDataFrame(rows, LOGS_SCHEMA)
    out = decode_events(logs, abi).collect()
    assert len(out) == 1
    e = out[0]
    assert e["event_type"] == "Mint" and e["minter"] == A1
    # params stringified like the reference (event_extractor.py:41)
    assert e["mintAmount"] == "1000" and e["mintTokens"] == str(BIG)


def test_param_order_indexed_first():
    abi = EventAbi(
        "X",
        (AbiInput("a", "uint256", False), AbiInput("b", "address", True), AbiInput("c", "uint256", True)),
    )
    assert [p.name for p in abi.params_in_order()] == ["b", "c", "a"]


def test_contract_classification(spark):
    # dispatch block: PUSH4 selectors then a JUMPI terminator, then junk PUSH4
    def code(selectors, junk="0x63deadbeef"):
        body = "".join("63" + s[2:] for s in selectors)
        return "0x" + body + "57" + junk[2:]  # 0x57 = JUMPI ends block 1

    erc20 = code(["0x18160ddd", "0x70a08231", "0xa9059cbb"])
    erc721 = code(["0x6352211e", "0x70a08231"])
    empty = "0x"
    df = spark.createDataFrame(
        [("0xa", erc20), ("0xb", erc721), ("0xc", empty)], "address string, bytecode string"
    )
    out = {r["address"]: r for r in classify_contracts(df).collect()}
    assert out["0xa"]["is_erc20"] and not out["0xa"]["is_erc721"]
    assert out["0xb"]["is_erc721"] and not out["0xb"]["is_erc20"]
    assert out["0xa"]["function_sighashes"] == ["0x18160ddd", "0x70a08231", "0xa9059cbb"]
    # junk PUSH4 after the terminator is NOT collected (first basic block only)
    assert "0xdeadbeef" not in out["0xa"]["function_sighashes"]
    assert out["0xc"]["function_sighashes"] is None
