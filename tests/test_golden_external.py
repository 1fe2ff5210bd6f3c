"""External cross-validation against libsodium's ristretto255 + golden pins.

Round-1 verdict: every protocol test was a self-round-trip — a drift in
point encoding, group law, Elligator map, or generator derivation would be
invisible.  libsodium (independent implementation, interoperable with
curve25519-dalek by the ristretto255 spec) breaks that loop for:

  * compressed-point wire format (the `.coms` contract,
    reference src/lalrpop/assignment_parser.rs:137-138,205)
  * group law + scalar multiplication (prover/verifier commitments,
    reference src/gadget.rs:32, src/commitments.rs)
  * RistrettoPoint::from_uniform_bytes (Elligator) — the core of
    BulletproofGens / PedersenGens derivation (reference src/prove.rs:46,78)
  * the scalar field mod l (reference conversions.rs / gadget math)

What libsodium CANNOT pin: the GeneratorsChain labels and 64-byte stream
layout (dalek bulletproofs-generators convention: SHAKE256 of
b"GeneratorsChain" || label, label = b"G"/b"H" + u32le(party)), and the
Merlin transcript interleaving.  Those are pinned separately: labels by the
GOLDEN_* hex constants below (regression-frozen, reviewed against
bulletproofs 2.x generators.rs), Merlin by merlin-2.0.1 vectors in
tests/test_merlin.py.
"""
import hashlib
import os

import pytest

from bulletproof_gadgets_tpu.utils import sodium
from bulletproof_gadgets_tpu.core.ristretto import (
    RistrettoPoint, RISTRETTO_BASEPOINT)
from bulletproof_gadgets_tpu.core.scalar import Scalar, L
from bulletproof_gadgets_tpu.core.gens import PedersenGens, BulletproofGens
from bulletproof_gadgets_tpu.core.msm import msm_host

pytestmark = pytest.mark.skipif(
    not sodium.available(), reason="libsodium ristretto255 not available")

# Golden fixtures: first 4 points of each BulletproofGens chain (party 0)
# and the PedersenGens blinding base.  Derived by the EXTERNAL pipeline
# hashlib.shake_256 -> libsodium from_hash; any drift in chain labels,
# stream layout, Elligator map, or compression trips these.
GOLDEN_G = [
    "fc3b25801422672a6a8d3adb5d8457d4301fe92324b4fc56ae934c8713ddfe2d",
    "ae817fdef62f713dd169dc8a26406f68be0bd3cd53652614636b0801567c4264",
    "5ab2b9a44c915a25c82474c60a01c1b9f714dbcca25d93e99d16743ee8afe155",
    "52b6cd0ce3946dbcf7738a69fbdf4e941bf2310ef913636676b4d8e074128b7a",
]
GOLDEN_H = [
    "ba698f6dd08c501e32b55d2ee7259f6019d629fa2ba4d7039c5de157cba4df73",
    "acf2d2b95428fac99b12da3bab92edf8ea3788c2fd16769e586397eede7b5052",
    "acefdc7f3bd3b9c514c3cc516337be81510fa637b682892cacfc43b79177821c",
    "b6a8c8d248c72b480e928123ba03fe578b17cb0f92eb917456167ebabc4c0359",
]
GOLDEN_B_BLINDING = \
    "8c9240b456a9e6dc65c377a1048d745f94a08cdb7f44cbcd7b46f34048871134"


def _rand_scalar(rng) -> int:
    return int.from_bytes(rng(32), "little") % L or 1


def _rng(seed: int):
    state = hashlib.sha256(seed.to_bytes(4, "big")).digest()

    def take(n: int) -> bytes:
        nonlocal state
        out = b""
        while len(out) < n:
            state = hashlib.sha256(state).digest()
            out += state
        return out[:n]

    return take


def test_basepoint_encoding():
    assert RISTRETTO_BASEPOINT.compress() == \
        sodium.scalarmult_base((1).to_bytes(32, "little"))


def test_point_addition_matches_sodium():
    rng = _rng(1)
    for _ in range(16):
        a, b = _rand_scalar(rng), _rand_scalar(rng)
        P = RISTRETTO_BASEPOINT.scalar_mul(a)
        Q = RISTRETTO_BASEPOINT.scalar_mul(b)
        ours = (P + Q).compress()
        ext = sodium.add(P.compress(), Q.compress())
        assert ours == ext


def test_scalar_mul_matches_sodium():
    rng = _rng(2)
    for _ in range(8):
        k, a = _rand_scalar(rng), _rand_scalar(rng)
        P = RISTRETTO_BASEPOINT.scalar_mul(a)
        ours = P.scalar_mul(k).compress()
        ext = sodium.scalarmult(k.to_bytes(32, "little"), P.compress())
        assert ours == ext


def test_compress_decompress_validity():
    rng = _rng(3)
    for _ in range(8):
        P = RISTRETTO_BASEPOINT.scalar_mul(_rand_scalar(rng))
        enc = P.compress()
        assert sodium.is_valid_point(enc)
        assert RistrettoPoint.decompress(enc) == P
    # invalid encodings rejected by both
    bad = bytearray(RISTRETTO_BASEPOINT.compress())
    bad[0] ^= 1
    bad = bytes(bad)
    assert RistrettoPoint.decompress(bad) is None or \
        not sodium.is_valid_point(bad)


def test_elligator_from_uniform_matches_sodium():
    rng = _rng(4)
    for _ in range(16):
        blk = rng(64)
        assert RistrettoPoint.from_uniform_bytes(blk).compress() == \
            sodium.from_hash(blk)


def test_generator_chain_golden():
    """BulletproofGens G/H chains: ours vs external pipeline vs golden pins."""
    bp = BulletproofGens(4)
    for label, golden, pts in ((b"G", GOLDEN_G, bp.G(4)),
                               (b"H", GOLDEN_H, bp.H(4))):
        stream = hashlib.shake_256(
            b"GeneratorsChain" + label + (0).to_bytes(4, "little")
        ).digest(64 * 4)
        for i in range(4):
            ext = sodium.from_hash(stream[64 * i:64 * (i + 1)])
            assert ext.hex() == golden[i]
            assert pts[i].compress() == ext


def test_pedersen_b_blinding_golden():
    pc = PedersenGens.default()
    assert pc.B_blinding.compress().hex() == GOLDEN_B_BLINDING
    # external derivation end-to-end
    h = hashlib.sha3_512(RISTRETTO_BASEPOINT.compress()).digest()
    assert sodium.from_hash(h).hex() == GOLDEN_B_BLINDING


def test_pedersen_commit_matches_sodium():
    pc = PedersenGens.default()
    rng = _rng(5)
    for _ in range(4):
        v, r = _rand_scalar(rng), _rand_scalar(rng)
        ours = pc.commit(Scalar(v), Scalar(r)).compress()
        ext = sodium.add(
            sodium.scalarmult(v.to_bytes(32, "little"), pc.B.compress()),
            sodium.scalarmult(r.to_bytes(32, "little"),
                              pc.B_blinding.compress()))
        assert ours == ext


def test_msm_matches_sodium():
    rng = _rng(6)
    n = 32
    ks = [_rand_scalar(rng) for _ in range(n)]
    pts = [RISTRETTO_BASEPOINT.scalar_mul(_rand_scalar(rng))
           for _ in range(n)]
    ours = msm_host(ks, pts).compress()
    acc = sodium.scalarmult(ks[0].to_bytes(32, "little"), pts[0].compress())
    for k, p in zip(ks[1:], pts[1:]):
        acc = sodium.add(
            acc, sodium.scalarmult(k.to_bytes(32, "little"), p.compress()))
    assert ours == acc


def test_scalar_field_matches_sodium():
    rng = _rng(7)
    for _ in range(16):
        a, b = _rand_scalar(rng), _rand_scalar(rng)
        ab, bb = a.to_bytes(32, "little"), b.to_bytes(32, "little")
        assert (Scalar(a) * Scalar(b)).as_bytes() == sodium.scalar_mul(ab, bb)
        assert (Scalar(a) + Scalar(b)).as_bytes() == sodium.scalar_add(ab, bb)
        assert Scalar(a).invert().as_bytes() == sodium.scalar_invert(ab)
    wide = rng(64)
    assert Scalar.from_bytes_mod_order_wide(wide).as_bytes() == \
        sodium.scalar_reduce(wide)


def test_device_msm_matches_sodium():
    """TPU MSM backend (cols+Pallas pipeline) vs the external oracle."""
    from bulletproof_gadgets_tpu.ops import engine
    engine.register()
    from bulletproof_gadgets_tpu.core import msm as core_msm
    rng = _rng(8)
    n = 256
    ks = [_rand_scalar(rng) for _ in range(n)]
    pts = [RISTRETTO_BASEPOINT.scalar_mul(_rand_scalar(rng))
           for _ in range(n)]
    ours = core_msm.msm(ks, pts).compress()
    acc = sodium.scalarmult(ks[0].to_bytes(32, "little"), pts[0].compress())
    for k, p in zip(ks[1:], pts[1:]):
        acc = sodium.add(
            acc, sodium.scalarmult(k.to_bytes(32, "little"), p.compress()))
    assert ours == acc
