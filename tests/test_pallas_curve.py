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


def test_lazy_reduction_bounds():
    """Worst-case limb-magnitude propagation through the lazy-reduction
    madd/padd chain (pallas_curve._wred/_finalize/_lazy + the wide 64p
    bias): proves no int32 overflow and a self-sustaining 8799 limb
    invariant for ANY input values, by running interval arithmetic over the
    exact op sequence.  Guards future edits to the reduction ladders."""
    from bulletproof_gadgets_tpu.ops import fp, pallas_curve as pc

    B, NL, MASK, FOLD = fp.B, fp.NL, fp.MASK, fp.FOLD
    I32 = (1 << 31) - 1

    def redistribute(b, rounds):
        b = list(b) + [0] * rounds
        for _ in range(rounds):
            nb = [min(x, MASK) for x in b]
            carry = [0] + [x >> B for x in b[:-1]]
            b = [x + c for x, c in zip(nb, carry)]
        return b

    def fold(b):
        if len(b) <= NL:
            return list(b)
        lo, hi = b[:NL], b[NL:]
        hi = hi + [0] * (NL - len(hi)) if len(hi) < NL else fold(hi)
        return [l + h * FOLD for l, h in zip(lo, hi)]

    def wred(b, rounds):
        assert len(b) == NL
        for _ in range(rounds):
            lo = [min(x, MASK) for x in b]
            hi = [x >> B for x in b]
            b = ([lo[0] + hi[-1] * FOLD]
                 + [l + h for l, h in zip(lo[1:], hi[:-1])])
        return b

    def mul_cols(a, b, tag):
        out = [0] * (2 * NL - 1)
        for i in range(NL):
            for j in range(NL):
                out[i + j] += a[i] * b[j]
        assert max(out) <= I32, (tag, max(out).bit_length())
        return out

    def finalize(c):
        return wred(fold(redistribute(c, 3)), 2)

    def lazy(c):
        return wred(c, 2)

    biasW = [int(v) for v in pc._SUB_BIAS_COL.reshape(-1)]
    NORM = [MASK + 1] * NL          # canonical sources (gx/gy/gt, d2)
    INV = 8799                       # claimed invariant

    def madd(x1, y1, z1, t1):
        assert all(bw >= v for bw, v in zip(biasW, x1)), "bias < x1"
        a = finalize(mul_cols(lazy([y + bw for y, bw in zip(y1, biasW)]),
                              lazy([n2 + bw for n2, bw in zip(NORM, biasW)]),
                              "a"))
        b = finalize(mul_cols(lazy([y + x for y, x in zip(y1, x1)]),
                              lazy([2 * n2 for n2 in NORM]), "b"))
        c = finalize(mul_cols(t1, NORM, "c"))
        d = lazy([z + z for z in z1])
        for v, tag in ((a, "a"), (c, "c")):
            assert all(bw >= vi for bw, vi in zip(biasW, v)), f"bias < {tag}"
        e = lazy([v + bw for v, bw in zip(b, biasW)])
        f = lazy([v + bw for v, bw in zip(d, biasW)])
        g = lazy([v + cc for v, cc in zip(d, c)])
        h = lazy([v + aa for v, aa in zip(b, a)])
        return (finalize(mul_cols(e, f, "X")), finalize(mul_cols(g, h, "Y")),
                finalize(mul_cols(f, g, "Z")), finalize(mul_cols(e, h, "T")))

    state = tuple([INV] * NL for _ in range(4))   # worst-case accumulator
    prev = None
    for it in range(50):
        state = madd(*state)
        assert max(max(v) for v in state) <= INV, (it, state)
        if state == prev:
            break
        prev = state
    assert prev == state, "no fixed point reached"

    # padd chain (scans/horner): inputs at the invariant, incl. t*t*d2
    x1 = y1 = z1 = t1 = [INV] * NL
    c = finalize(mul_cols(finalize(mul_cols(t1, t1, "tt")), NORM, "ttd"))
    d = lazy([2 * v for v in finalize(mul_cols(z1, z1, "zz"))])
    a = finalize(mul_cols(lazy([v + bw for v, bw in zip(y1, biasW)]),
                          lazy([v + bw for v, bw in zip(y1, biasW)]), "pa"))
    h = lazy([v + v2 for v, v2 in zip(a, a)])
    assert max(h) <= INV
