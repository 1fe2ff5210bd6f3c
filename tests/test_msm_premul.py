"""Premultiplied-window (c=16) serial-bucket MSM vs the host oracle."""
import numpy as np
import pytest

from bulletproof_gadgets_tpu.core.ristretto import RISTRETTO_BASEPOINT
from bulletproof_gadgets_tpu.core.scalar import L
from bulletproof_gadgets_tpu.core.msm import msm_host
from bulletproof_gadgets_tpu.ops import msm_premul


def _points(n, seed=7):
    r = np.random.default_rng(seed)
    return [RISTRETTO_BASEPOINT.scalar_mul(
        int.from_bytes(r.bytes(32), "little") % L) for _ in range(n)]


def _scalars(n, seed=11):
    r = np.random.default_rng(seed)
    return [int.from_bytes(r.bytes(32), "little") % L for _ in range(n)]


@pytest.mark.slow
def test_premul_matches_oracle(tmp_path, monkeypatch):
    monkeypatch.setattr(msm_premul, "_CACHE_DIR", str(tmp_path))
    n = 40
    pts = _points(n)
    vecs = [_scalars(n, 1),
            [int(b) for b in np.random.default_rng(2).integers(0, 2, n)],
            [0] * (n - 1) + [1]]
    table = msm_premul.PremulTable(pts)
    got = table.msm_many(vecs)
    for g, vec in zip(got, vecs):
        assert g.compress() == msm_host(vec, pts).compress()
    # cache round-trip: second table loads from disk, same results
    table2 = msm_premul.PremulTable(pts)
    got2 = table2.msm_many(vecs[:1])
    assert got2[0].compress() == got[0].compress()
