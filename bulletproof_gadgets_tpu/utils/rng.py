"""Blinding randomness.

The reference draws OS randomness for every Pedersen blinding
(/root/reference/src/gadget.rs:32, src/commitments.rs:28,40 and inside
`prover.prove`).  Blindings never need to match any other implementation —
only to be uniform — so we use a seedable ChaCha-free stdlib source:
`secrets` by default, or a deterministic stream when BPG_TPU_SEED is set
(determinism tests / reproducible proofs).
"""
import hashlib
import os
import secrets

from ..core.scalar import L, Scalar

_seed = os.environ.get("BPG_TPU_SEED")
_counter = 0


def set_seed(seed):
    """Set (or clear with None) the deterministic blinding seed."""
    global _seed, _counter
    _seed = None if seed is None else str(seed)
    _counter = 0


def random_scalar() -> Scalar:
    global _counter
    if _seed is None:
        return Scalar(secrets.randbits(512) % L)
    _counter += 1
    stream = hashlib.shake_256(
        b"bpg-tpu-blinding" + _seed.encode() + _counter.to_bytes(8, "little")
    ).digest(64)
    return Scalar(int.from_bytes(stream, "little") % L)
