"""SP-sharded IPA (parallel/sharded_ipa) vs the single-device path: same
L/R points, same final a/b — byte-identical proofs with the state vectors
sharded over the 8-device virtual mesh."""
import random

import pytest

import jax

from bulletproof_gadgets_tpu.core.scalar import Scalar, L
from bulletproof_gadgets_tpu.core.gens import PedersenGens, BulletproofGens
from bulletproof_gadgets_tpu.core.ipa import InnerProductProof
from bulletproof_gadgets_tpu.utils.merlin import Transcript

pytestmark = pytest.mark.slow

rnd = random.Random(77)


def _run(table, n):
    pc = PedersenGens.default()
    bp = BulletproofGens(n, 1)
    G = bp.G(n)
    H = bp.H(n)
    w = Scalar.from_int(rnd.randrange(1, L))
    Q = pc.B.scalar_mul(w.v)
    Gf = [Scalar.from_int(rnd.randrange(1, L)) for _ in range(n)]
    Hf = [Scalar.from_int(rnd.randrange(1, L)) for _ in range(n)]
    a = [Scalar.from_int(rnd.randrange(L)) for _ in range(n)]
    b = [Scalar.from_int(rnd.randrange(L)) for _ in range(n)]
    t = Transcript(b"shardedipa")
    proof = InnerProductProof.create(t, Q, Gf, Hf, G, H, a, b,
                                     table=table, w=w)
    return proof.to_bytes(), (Gf, Hf, a, b, w, G, H)


def test_sharded_ipa_byte_identical():
    from bulletproof_gadgets_tpu.core.gens import (PedersenGens,
                                                   BulletproofGens)
    from bulletproof_gadgets_tpu.ops import msm_serial
    from bulletproof_gadgets_tpu.parallel.mesh import make_mesh
    from bulletproof_gadgets_tpu.parallel.sharded_serial import (
        ShardedGeneratorTable)

    n = 32
    state = random.getstate()
    pc = PedersenGens.default()
    bp = BulletproofGens(n, 1)
    single = msm_serial.GeneratorTable(bp.G(n), bp.H(n), pc.B,
                                       pc.B_blinding)
    random.setstate(state)
    rnd.seed(7)
    bytes_single, _ = _run(single, n)

    mesh = make_mesh(n_shard=8, n_batch=1)
    sharded = ShardedGeneratorTable(mesh, bp.G(n), bp.H(n), pc.B,
                                    pc.B_blinding)
    rnd.seed(7)
    bytes_sharded, _ = _run(sharded, n)

    assert bytes_single == bytes_sharded

    # state really sharded: n_loc = n / 8 rows per device
    from bulletproof_gadgets_tpu.parallel import sharded_ipa
    assert sharded_ipa._supported(sharded, n)
