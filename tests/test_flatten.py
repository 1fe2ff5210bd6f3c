"""Vectorized constraint flattening (ops/flatten) vs the host bigint loop.

The device path must reproduce dalek's flattened_constraints exactly
(z-power weighting, negated V/One accumulation) for arbitrary mixes of
variable kinds and coefficient values.
"""
import random

from bulletproof_gadgets_tpu.core.scalar import Scalar, L
from bulletproof_gadgets_tpu.core.lc import (LinearCombination, Variable,
                                             ONE, COMMITTED, MULT_LEFT,
                                             MULT_RIGHT, MULT_OUT)
from bulletproof_gadgets_tpu.ops.flatten import flatten, MIN_DEVICE_TERMS


def _host_flatten(cons, n, m, z):
    wL = [0] * n
    wR = [0] * n
    wO = [0] * n
    wV = [0] * m
    wc = 0
    ez = z % L
    for lc in cons:
        for var, coeff in lc.terms:
            c = ez * coeff.v
            if var.kind == MULT_LEFT:
                wL[var.index] += c
            elif var.kind == MULT_RIGHT:
                wR[var.index] += c
            elif var.kind == MULT_OUT:
                wO[var.index] += c
            elif var.kind == COMMITTED:
                wV[var.index] -= c
            else:
                wc -= c
        ez = ez * z % L
    return ([x % L for x in wL], [x % L for x in wR], [x % L for x in wO],
            [x % L for x in wV], wc % L)


def test_flatten_matches_host_loop():
    rnd = random.Random(5)
    n, m = 700, 9
    cons = []
    for _ in range(900):
        terms = []
        for _ in range(rnd.randrange(1, 8)):
            kind = rnd.choice([ONE, COMMITTED, MULT_LEFT, MULT_RIGHT,
                               MULT_OUT])
            idx = (rnd.randrange(m) if kind == COMMITTED
                   else rnd.randrange(n) if kind != ONE else 0)
            coeff = Scalar.from_int(
                rnd.choice([1, 2, L - 1, rnd.randrange(L)]))
            terms.append((Variable(kind, idx), coeff))
        cons.append(LinearCombination(terms))
    z = rnd.randrange(1, L)

    f = flatten(cons, n, m, z, with_wc=True)
    assert f is not None
    eL, eR, eO, eV, ec = _host_flatten(cons, n, m, z)
    gL, gR, gO = f.ints()
    assert gL == eL
    assert gR == eR
    assert gO == eO
    assert f.wV == eV
    assert f.wc == ec


def test_flatten_small_circuit_falls_back():
    cons = [LinearCombination([(Variable(MULT_LEFT, 0), Scalar.one())])]
    assert len(cons[0].terms) < MIN_DEVICE_TERMS
    assert flatten(cons, 4, 0, 7, with_wc=False) is None
