"""Merlin transcript pinned against the merlin crate's published test vectors.

The hex strings below are from merlin 2.0.1's own unit tests
(transcript.rs: equivalence_simple / equivalence_complex), which the Rust
reference depends on for every Fiat-Shamir challenge.
"""
from bulletproof_gadgets_tpu.utils.merlin import Transcript


def test_equivalence_simple():
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    challenge = t.challenge_bytes(b"challenge", 32)
    assert challenge.hex() == (
        "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615")


def test_equivalence_complex():
    t = Transcript(b"test protocol")
    t.append_message(b"step1", b"some data")
    data = bytes([99] * 1024)
    chl = b""
    for _ in range(32):
        chl = t.challenge_bytes(b"challenge", 32)
        t.append_message(b"bigdata", data)
        t.append_message(b"challengedata", chl)
    assert chl.hex() == (
        "a8c933f54fae76e3f9bea93648c1308e7dfa2152dd51674ff3ca438351cf003c")
