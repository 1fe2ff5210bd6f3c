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


def test_flatten_high_multiplicity_mont_mul():
    """ADVICE r3 (high): scatter rows with many terms per target must come
    back normalized — pipe flatten output straight through mont_mul and
    compare against the host oracle.  Multiplicity up to 64 per variable."""
    import numpy as np
    import jax.numpy as jnp
    from bulletproof_gadgets_tpu.ops import flvec
    from bulletproof_gadgets_tpu.ops.fl import mont_mul

    rnd = random.Random(11)
    n, m = 64, 4
    cons = []
    # every constraint touches EVERY left/right variable -> multiplicity =
    # constraint count (64) for each target
    for _ in range(64):
        terms = []
        for i in range(n):
            terms.append((Variable(MULT_LEFT, i),
                          Scalar.from_int(rnd.randrange(1, L))))
        for i in range(0, n, 2):
            terms.append((Variable(MULT_RIGHT, i),
                          Scalar.from_int(rnd.randrange(1, L))))
        terms.append((Variable(ONE, 0), Scalar.from_int(rnd.randrange(L))))
        cons.append(LinearCombination(terms))
    assert sum(len(c.terms) for c in cons) >= MIN_DEVICE_TERMS
    z = rnd.randrange(1, L)

    f = flatten(cons, n, m, z, with_wc=True)
    assert f is not None
    eL, eR, eO, eV, ec = _host_flatten(cons, n, m, z)

    y = rnd.randrange(1, L)
    y_m = jnp.asarray(flvec.to_mont([y]))
    got = flvec.limbs_to_ints(
        np.asarray(mont_mul(f.wL, jnp.broadcast_to(y_m, f.wL.shape))))
    assert got == [v * y % L for v in eL]
    got_r = flvec.limbs_to_ints(
        np.asarray(mont_mul(f.wR, jnp.broadcast_to(y_m, f.wR.shape))))
    assert got_r == [v * y % L for v in eR]
    assert f.wV == eV and f.wc == ec


def test_flatten_chunked_huge_multiplicity():
    """ADVICE r3 (medium): the chunked fori_loop accumulator must not drop
    carries when one target receives terms across many chunks.  2^18 terms,
    half of them on a single MULT_LEFT variable."""
    import numpy as np
    import jax.numpy as jnp
    from bulletproof_gadgets_tpu.ops import flvec
    from bulletproof_gadgets_tpu.ops.fl import mont_mul
    from bulletproof_gadgets_tpu.ops.flatten import _SCATTER_CHUNK

    rnd = random.Random(13)
    n, m = 8, 2
    total = 1 << 18
    assert total > _SCATTER_CHUNK
    per_con = 1 << 10
    cons = []
    for _ in range(total // per_con):
        terms = []
        for _ in range(per_con):
            if rnd.random() < 0.5:
                v = Variable(MULT_LEFT, 0)       # hammer one target
            else:
                kind = rnd.choice([MULT_LEFT, MULT_RIGHT, MULT_OUT,
                                   COMMITTED, ONE])
                idx = (rnd.randrange(m) if kind == COMMITTED
                       else 0 if kind == ONE else rnd.randrange(n))
                v = Variable(kind, idx)
            terms.append((v, Scalar.from_int(rnd.randrange(L))))
        cons.append(LinearCombination(terms))
    z = rnd.randrange(1, L)

    f = flatten(cons, n, m, z, with_wc=True)
    assert f is not None
    eL, eR, eO, eV, ec = _host_flatten(cons, n, m, z)
    gL, gR, gO = f.ints()
    assert gL == eL and gR == eR and gO == eO
    assert f.wV == eV and f.wc == ec

    # and through mont_mul (the consumer contract)
    y = rnd.randrange(1, L)
    y_m = jnp.asarray(flvec.to_mont([y]))
    got = flvec.limbs_to_ints(
        np.asarray(mont_mul(f.wL, jnp.broadcast_to(y_m, f.wL.shape))))
    assert got == [v * y % L for v in eL]


def test_flatten_slab_path_matches_host_loop(monkeypatch):
    """Giant-circuit slab path (VERDICT r4 item 2): term counts past the
    one-shot graph cap run as fixed-size slab dispatches with a carried
    accumulator.  Shrunk thresholds force the path on a small circuit."""
    from bulletproof_gadgets_tpu.ops import flatten as fl_mod
    monkeypatch.setattr(fl_mod, "MAX_DEVICE_TERMS", 1 << 11)
    monkeypatch.setattr(fl_mod, "_SLAB", 1 << 10)
    fl_mod._extract_cache.clear()

    rnd = random.Random(11)
    n, m = 300, 5
    cons = []
    total = 0
    while total < 5000:
        terms = []
        for _ in range(rnd.randrange(3, 9)):
            kind = rnd.choice([ONE, COMMITTED, MULT_LEFT, MULT_RIGHT,
                               MULT_OUT])
            idx = (rnd.randrange(m) if kind == COMMITTED
                   else rnd.randrange(n) if kind != ONE else 0)
            terms.append((Variable(kind, idx),
                          Scalar.from_int(rnd.randrange(L))))
        cons.append(LinearCombination(terms))
        total += len(terms)

    z = rnd.randrange(1, L)
    f = fl_mod.flatten(cons, n, m, z, with_wc=True)
    assert f is not None
    eL, eR, eO, eV, ec = _host_flatten(cons, n, m, z)
    gL, gR, gO = f.ints()
    assert gL == eL and gR == eR and gO == eO
    assert f.wV == eV and f.wc == ec
    # warm hit drives the cached-entry slab branch too
    f2 = fl_mod.flatten(cons, n, m, z, with_wc=True)
    gL2, _, _ = f2.ints()
    assert gL2 == eL
    fl_mod._extract_cache.clear()
