"""Multi-device (virtual 8-CPU mesh) sharded MSM vs the host oracle."""
import random

import jax
import pytest

from bulletproof_gadgets_tpu.core.ristretto import RISTRETTO_BASEPOINT
from bulletproof_gadgets_tpu.core.scalar import L
from bulletproof_gadgets_tpu.core.msm import msm_host
from bulletproof_gadgets_tpu.parallel.mesh import make_mesh
from bulletproof_gadgets_tpu.parallel.sharded_msm import msm_sharded

rnd = random.Random(11)


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_msm_matches_host():
    mesh = make_mesh()
    n = 96
    pts = [RISTRETTO_BASEPOINT.scalar_mul(rnd.randrange(1, 1 << 64))
           for _ in range(n)]
    ks = [rnd.randrange(L) for _ in range(n)]
    got = msm_sharded(mesh, ks, pts)
    assert got == msm_host(ks, pts)


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_msm_uneven_padding():
    mesh = make_mesh()
    n = 77  # not divisible by 8
    pts = [RISTRETTO_BASEPOINT.scalar_mul(rnd.randrange(1, 1 << 64))
           for _ in range(n)]
    ks = [rnd.randrange(L) for _ in range(n)]
    got = msm_sharded(mesh, ks, pts)
    assert got == msm_host(ks, pts)
