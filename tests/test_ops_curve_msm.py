"""Device curve kernels and the Pippenger MSM vs the host oracle."""
import random

import numpy as np

from bulletproof_gadgets_tpu.core.ristretto import (RistrettoPoint,
                                                    RISTRETTO_BASEPOINT)
from bulletproof_gadgets_tpu.core.scalar import L
from bulletproof_gadgets_tpu.core import msm as msm_core
from bulletproof_gadgets_tpu.ops import curve, msm as msm_dev

rnd = random.Random(7)


def _rand_points(n):
    return [RISTRETTO_BASEPOINT.scalar_mul(rnd.randrange(1, 1 << 64))
            for _ in range(n)]


def test_padd_pdouble_vs_host():
    pts = _rand_points(8)
    qts = _rand_points(8)
    dp = curve.points_to_device(pts)
    dq = curve.points_to_device(qts)
    s = curve.points_from_device(curve.padd(dp, dq))
    d = curve.points_from_device(curve.pdouble(dp))
    n = curve.points_from_device(curve.pneg(dp))
    for i in range(8):
        assert s[i] == pts[i] + qts[i]
        assert d[i] == pts[i].double()
        assert n[i] == -pts[i]


def test_padd_identity_and_inverse():
    pts = _rand_points(4)
    dp = curve.points_to_device(pts)
    ident = curve.identity((4,))
    r = curve.points_from_device(curve.padd(dp, ident))
    z = curve.points_from_device(curve.padd(dp, curve.pneg(dp)))
    for i in range(4):
        assert r[i] == pts[i]
        assert z[i] == RistrettoPoint.identity()


def test_signed_digits_reconstruct():
    for c in (8, 16):
        ks = [rnd.randrange(L) for _ in range(50)] + [0, 1, L - 1]
        digits = msm_dev.signed_digits(ks, c)
        for k, row in zip(ks, digits):
            v = sum(int(d) << (c * w) for w, d in enumerate(row))
            assert v == k


def test_msm_device_vs_host():
    for n in (5, 64, 300):
        pts = _rand_points(n)
        ks = [rnd.randrange(L) for _ in range(n)]
        expected = msm_core.msm_host(ks, pts)
        got = msm_dev.msm(ks, pts)
        assert got == expected, f"n={n}"


def test_msm_device_chunked():
    n = 200
    pts = _rand_points(n)
    ks = [rnd.randrange(L) for _ in range(n)]
    digits = msm_dev.signed_digits(ks, 8)
    pd = curve.points_to_device(pts)
    ws = msm_dev.window_sums(digits, pd, 8, chunk=64)
    got = msm_dev.horner_combine(ws, 8)
    assert got == msm_core.msm_host(ks, pts)
