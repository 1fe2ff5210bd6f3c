"""Pallas-fused point kernels + cols-layout MSM vs host oracles
(interpret mode on CPU; compiled on TPU)."""
import random

import pytest

from bulletproof_gadgets_tpu.core.ristretto import (RISTRETTO_BASEPOINT,
                                                    RistrettoPoint)
from bulletproof_gadgets_tpu.core.scalar import L
from bulletproof_gadgets_tpu.core.msm import msm_host
from bulletproof_gadgets_tpu.ops import curve, msm_cols
from bulletproof_gadgets_tpu.ops.pallas_curve import (padd_cols, to_cols,
                                                      from_cols, BLOCK)

rnd = random.Random(31)


def _pts(n):
    return [RISTRETTO_BASEPOINT.scalar_mul(rnd.randrange(1, 1 << 64))
            for _ in range(n)]


def test_pallas_padd():
    n = BLOCK
    a = _pts(n)
    b = _pts(n)
    da = to_cols(curve.points_to_device(a))
    db = to_cols(curve.points_to_device(b))
    out = curve.points_from_device(from_cols(padd_cols(da, db)))
    for i in range(0, n, 37):
        assert out[i] == a[i] + b[i]
    # identity + doubling through the same unified kernel
    ident = to_cols(curve.identity((n,)))
    out2 = curve.points_from_device(from_cols(padd_cols(da, ident)))
    out3 = curve.points_from_device(from_cols(padd_cols(da, da)))
    for i in range(0, n, 61):
        assert out2[i] == a[i]
        assert out3[i] == a[i].double()


@pytest.mark.slow
def test_msm_cols_vs_host():
    # interpret-mode pallas is slow on CPU; the quick suite covers the padd
    # kernel, full MSM correctness runs in the slow suite / on TPU
    for n in (16, 96):
        pts = _pts(n)
        ks = [rnd.randrange(L) for _ in range(n)]
        assert msm_cols.msm(ks, pts) == msm_host(ks, pts), n


@pytest.mark.slow
def test_msm_cols_blocked_scan():
    # n = 1024 crosses the 512-lane block boundary (pass 2/3 of the
    # blocked scan)
    n = 1024
    pts = _pts(n)
    ks = [rnd.randrange(L) for _ in range(n)]
    assert msm_cols.msm(ks, pts) == msm_host(ks, pts)
