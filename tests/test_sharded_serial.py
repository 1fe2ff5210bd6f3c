"""Sharded serial-bucket MSM (parallel/sharded_serial.py) on the virtual
8-CPU mesh: window-sum partitioning must be EXACT (modular group law), so
sharded results — and whole proofs — are byte-identical to single-device.

This is the TP/SP axis of SURVEY.md §2.C wired into the real pipeline
(the reference's MSMs live inside prover.prove / verifier.verify,
/root/reference/src/prove.rs:79, src/verify.rs:71)."""
import numpy as np
import pytest

from bulletproof_gadgets_tpu.core.ristretto import RISTRETTO_BASEPOINT
from bulletproof_gadgets_tpu.core.scalar import Scalar, L
from bulletproof_gadgets_tpu.core.gens import PedersenGens, BulletproofGens
from bulletproof_gadgets_tpu.ops import msm_serial
from bulletproof_gadgets_tpu.parallel.mesh import make_mesh, activate
from bulletproof_gadgets_tpu.parallel.sharded_serial import (
    ShardedGeneratorTable)
from bulletproof_gadgets_tpu.utils import rng


def _points(n, seed=7):
    r = np.random.default_rng(seed)
    return [RISTRETTO_BASEPOINT.scalar_mul(
        int.from_bytes(r.bytes(32), "little") % L) for _ in range(n)]


def _scalars(n, seed=11):
    r = np.random.default_rng(seed)
    return [int.from_bytes(r.bytes(32), "little") % L for _ in range(n)]


@pytest.mark.slow
def test_sharded_table_matches_single():
    N = 64                       # m = 130 entries over 8 shards
    G = _points(N, 1)
    H = _points(N, 2)
    B = RISTRETTO_BASEPOINT
    Bb = _points(1, 3)[0]
    vecs = [_scalars(2 * N + 2, 4), _scalars(2 * N + 2, 5)]
    single = msm_serial.GeneratorTable(G, H, B, Bb).msm_many(vecs)
    mesh = make_mesh()
    sharded = ShardedGeneratorTable(mesh, G, H, B, Bb).msm_many(vecs)
    for a, b in zip(single, sharded):
        assert a.compress() == b.compress()


@pytest.mark.slow
def test_sharded_prove_byte_identical():
    """Full SDK prove on the 8-device mesh == single-device proof bytes."""
    from test_r1cs_roundtrip import _prove_range, _verify_range

    rng.set_seed("shard-parity")
    pc, bp, com, proof_single, n = _prove_range(0x1234ABCD, 96)
    try:
        activate(make_mesh())
        rng.set_seed("shard-parity")
        pc2, bp2, com2, proof_sharded, _ = _prove_range(0x1234ABCD, 96)
    finally:
        activate(None)
        rng.set_seed(None)
    assert com == com2
    assert proof_single.to_bytes() == proof_sharded.to_bytes()
    # and the sharded verifier accepts it
    try:
        activate(make_mesh())
        assert _verify_range(pc, bp, com, proof_sharded, n)
    finally:
        activate(None)
