"""Pure-Python Keccak-256 — the original Keccak (pre-SHA-3 padding, domain
byte 0x01) that Ethereum uses for event-signature topics and selectors.

Implemented from the public Keccak specification (Bertoni, Daemen, Peeters,
Van Assche — keccak.team). Driver-side only: the engine computes topic
constants once per subscribed ABI on the driver, exactly like the reference
precomputes them (services/eth_event_service.py), so pure-Python throughput
is irrelevant — no per-row use anywhere.
"""

from __future__ import annotations

_MASK = (1 << 64) - 1

_ROUND_CONSTANTS = (
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
)

# rotation offsets r[x][y] (spec table)
_ROTATIONS = (
    (0, 36, 3, 41, 18),
    (1, 44, 10, 45, 2),
    (62, 6, 43, 15, 61),
    (28, 55, 25, 21, 56),
    (27, 20, 39, 8, 14),
)

_RATE_BYTES = 136  # Keccak-256: rate 1088 bits, capacity 512


def _rotl(v: int, n: int) -> int:
    return ((v << n) | (v >> (64 - n))) & _MASK


def _keccak_f1600(a: list[list[int]]) -> None:
    for rc in _ROUND_CONSTANTS:
        # θ
        c = [a[x][0] ^ a[x][1] ^ a[x][2] ^ a[x][3] ^ a[x][4] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rotl(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                a[x][y] ^= d[x]
        # ρ + π
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rotl(a[x][y], _ROTATIONS[x][y])
        # χ
        for x in range(5):
            for y in range(5):
                a[x][y] = b[x][y] ^ ((~b[(x + 1) % 5][y] & _MASK) & b[(x + 2) % 5][y])
        # ι
        a[0][0] ^= rc


def keccak256(data: bytes) -> bytes:
    """Keccak-256 digest (Ethereum's hash: multi-rate padding 0x01…0x80)."""
    state = [[0] * 5 for _ in range(5)]
    # pad
    padded = bytearray(data)
    pad_len = _RATE_BYTES - (len(padded) % _RATE_BYTES)
    padded += b"\x01" + b"\x00" * (pad_len - 2) + b"\x80" if pad_len >= 2 else b"\x81"
    # absorb
    for off in range(0, len(padded), _RATE_BYTES):
        block = padded[off : off + _RATE_BYTES]
        for i in range(_RATE_BYTES // 8):
            lane = int.from_bytes(block[i * 8 : i * 8 + 8], "little")
            x, y = i % 5, i // 5
            state[x][y] ^= lane
        _keccak_f1600(state)
    # squeeze (32 bytes < rate: one pass)
    out = bytearray()
    for i in range(4):
        x, y = i % 5, i // 5
        out += state[x][y].to_bytes(8, "little")
    return bytes(out)


def keccak256_hex(data: bytes | str) -> str:
    if isinstance(data, str):
        data = data.encode()
    return keccak256(data).hex()


def event_topic0(signature: str) -> str:
    """0x-prefixed event-signature topic, e.g.
    event_topic0('Transfer(address,address,uint256)') ==
    '0xddf252ad…' (the reference's precomputed constant,
    jobs/extractors/token_transfer_extractor.py:31)."""
    return "0x" + keccak256_hex(signature)
