"""Device-resident IPA (ops/ipa_device.py) vs the host path: byte-identical
L/R points, challenges, and final a/b (same contract as dalek's
inner_product_proof.rs create)."""
import numpy as np
import pytest

from bulletproof_gadgets_tpu.core.gens import PedersenGens, BulletproofGens
from bulletproof_gadgets_tpu.core.scalar import Scalar, L, exp_iter
from bulletproof_gadgets_tpu.core.ipa import InnerProductProof
from bulletproof_gadgets_tpu.utils.merlin import new_transcript
from bulletproof_gadgets_tpu.ops import msm_serial


def _rand_scalars(n, seed):
    rng = np.random.default_rng(seed)
    return [Scalar(int.from_bytes(rng.bytes(32), "little") % L)
            for _ in range(n)]


@pytest.mark.parametrize("n", [2, 8, 32])
def test_device_ipa_matches_host(n):
    pc = PedersenGens.default()
    bp = BulletproofGens(n)
    G, H = list(bp.G(n)), list(bp.H(n))
    a = _rand_scalars(n, 1)
    b = _rand_scalars(n, 2)
    y_inv = _rand_scalars(1, 3)[0]
    G_factors = [Scalar(1)] * n
    H_factors = exp_iter(y_inv, n)
    w = _rand_scalars(1, 4)[0]
    Q = pc.B.scalar_mul(w.v)

    t_host = new_transcript(b"ipa-test")
    host = InnerProductProof.create(
        t_host, Q, list(G_factors), list(H_factors),
        list(G), list(H), list(a), list(b))

    table = msm_serial.GeneratorTable(G, H, pc.B, pc.B_blinding)
    t_dev = new_transcript(b"ipa-test")
    dev = InnerProductProof.create(
        t_dev, Q, list(G_factors), list(H_factors),
        list(G), list(H), list(a), list(b), table=table, w=w)

    assert dev.L_vec == host.L_vec
    assert dev.R_vec == host.R_vec
    assert dev.a.v % L == host.a.v % L
    assert dev.b.v % L == host.b.v % L
    # transcripts advanced identically
    assert t_host.challenge_bytes(b"x", 32) == t_dev.challenge_bytes(b"x", 32)
