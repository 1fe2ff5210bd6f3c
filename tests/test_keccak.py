"""Keccak-f[1600] pinned against hashlib by rebuilding SHA3/SHAKE on top."""
import hashlib

from bulletproof_gadgets_tpu.utils.keccak import f1600_bytes


def _sponge(data: bytes, rate: int, pad_byte: int, out_len: int) -> bytes:
    state = bytearray(200)
    # absorb
    msg = bytearray(data)
    # pad10*1 with domain byte
    pad_len = rate - (len(msg) % rate)
    padding = bytearray(pad_len)
    padding[0] = pad_byte
    padding[-1] ^= 0x80
    msg += padding
    for off in range(0, len(msg), rate):
        for i in range(rate):
            state[i] ^= msg[off + i]
        f1600_bytes(state)
    # squeeze
    out = bytearray()
    while len(out) < out_len:
        out += state[:rate]
        f1600_bytes(state)
    return bytes(out[:out_len])


def test_sha3_256_vs_hashlib():
    for msg in [b"", b"abc", b"x" * 135, b"y" * 136, b"z" * 1000]:
        assert _sponge(msg, 136, 0x06, 32) == hashlib.sha3_256(msg).digest()


def test_shake256_vs_hashlib():
    for msg in [b"", b"GeneratorsChain", b"q" * 200]:
        assert _sponge(msg, 136, 0x1F, 64) == hashlib.shake_256(msg).digest(64)


def test_sha3_512_vs_hashlib():
    assert _sponge(b"bulletproofs", 72, 0x06, 64) == hashlib.sha3_512(
        b"bulletproofs").digest()
