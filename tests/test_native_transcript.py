"""Native (C) Merlin transcript vs the Python implementation."""
import pytest

from bulletproof_gadgets_tpu.native import load, NativeTranscript
from bulletproof_gadgets_tpu.utils.merlin import Transcript


@pytest.mark.skipif(load() is None, reason="native library unavailable")
def test_native_matches_python():
    tp = Transcript(b"test protocol")
    tn = NativeTranscript(b"test protocol")
    script = [(b"some label", b"some data"), (b"x", b""),
              (b"big", bytes(range(256)) * 3)]
    for label, msg in script:
        tp.append_message(label, msg)
        tn.append_message(label, msg)
        assert tp.challenge_bytes(b"c", 32) == tn.challenge_bytes(b"c", 32)
    tp.append_u64(b"m", 123456789)
    tn.append_u64(b"m", 123456789)
    assert tp.challenge_bytes(b"final", 64) == tn.challenge_bytes(b"final", 64)


@pytest.mark.skipif(load() is None, reason="native library unavailable")
def test_native_merlin_vector():
    t = NativeTranscript(b"test protocol")
    t.append_message(b"some label", b"some data")
    assert t.challenge_bytes(b"challenge", 32).hex() == (
        "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615")
