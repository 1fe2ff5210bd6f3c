"""Pallas-fused Edwards point addition for TPU.

Motivation (measured): the jnp composition of padd executes as dozens of
unfused elementwise ops, each round-tripping HBM with an [n, 20] layout that
wastes 84% of every 128-lane vector tile.  This kernel fuses the entire
unified addition into ONE VMEM-resident pass over limbs-leading [NL, n]
blocks: lanes = points, sublanes = limbs, every op a full-width VPU op.

Field math inside the kernel mirrors ops/fp.py exactly (13-bit limbs,
redistribute carries, fold-608 reduction, 96p sub bias) — the same invariant
analysis applies; oracle tests in tests/test_pallas_curve.py compare against
the jnp path and the host group law.

Layout contract: points are pytrees (X, Y, Z, T) of int32 [NL, n] arrays
(transposed from ops/curve.py's [n, NL]); `to_cols`/`from_cols` convert.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import fp
from .curve import _D2_LIMBS

NL = fp.NL
B = fp.B
MASK = fp.MASK
FOLD = fp.FOLD

def _make_wide_bias() -> np.ndarray:
    """Kernel subtraction bias: 64*p decomposed with every limb in
    [2^14 - 2, 2^14 + 2^13): large enough to dominate any lite-finalized
    limb (invariant bound 8799, see _finalize) so x + bias - y never goes
    negative per limb, small enough that sums stay _wred-safe.  Telescoping
    construction: adding 2^14 at limb i is repaid by subtracting 2 at limb
    i+1 (2^14 / 2^13), so the value stays exactly 64*p."""
    Kp = 64 * fp.P
    canon = [(Kp >> (B * i)) & MASK for i in range(NL - 1)]
    top = Kp >> (B * (NL - 1))
    h, br = 1 << 14, (1 << 14) >> B
    c = ([canon[0] + h]
         + [canon[i] + h - br for i in range(1, NL - 1)]
         + [top - br])
    assert sum(ci << (B * i) for i, ci in enumerate(c)) == Kp
    assert all(8800 <= ci < (1 << 15) for ci in c), c
    return np.array(c, dtype=np.int32)


_SUB_BIAS_COL = _make_wide_bias().reshape(NL, 1)  # [NL, 1] kernel bias
_D2_COL = _D2_LIMBS.reshape(NL, 1)

BLOCK = 512


def _shift_up(x, pad_rows: int = 0):
    """Shift rows up by one limb position (carry propagation direction):
    out[i] = x[i-1]; optionally grow by pad_rows zero rows at the top."""
    w = x.shape[0]
    zeros = jnp.zeros((1 + pad_rows, x.shape[1]), dtype=x.dtype)
    return jnp.concatenate([zeros[:1], x, zeros[1:]], axis=0)[:w + pad_rows]


def _redistribute(cols, rounds: int):
    """Carry passes on [W, n] columns; width grows by `rounds`."""
    w = cols.shape[0]
    pad = jnp.zeros((rounds, cols.shape[1]), dtype=cols.dtype)
    cols = jnp.concatenate([cols, pad], axis=0)
    for _ in range(rounds):
        lo = cols & MASK
        hi = cols >> B
        hi_up = jnp.concatenate(
            [jnp.zeros((1, cols.shape[1]), cols.dtype), hi[:-1]], axis=0)
        cols = lo + hi_up
    return cols


def _fold(cols):
    w = cols.shape[0]
    if w <= NL:
        return cols
    lo = cols[:NL]
    hi = cols[NL:]
    if hi.shape[0] < NL:
        hi = jnp.concatenate(
            [hi, jnp.zeros((NL - hi.shape[0], cols.shape[1]), cols.dtype)],
            axis=0)
    else:
        hi = _fold(hi)
    return lo + hi * FOLD


def _wred(x, rounds: int):
    """Wrap-around carry passes on exactly-[NL, n] columns: the carry out of
    limb 19 weighs 2^260 ≡ FOLD (mod p), so it re-enters at limb 0 times
    FOLD.  Width never grows — unlike _redistribute+_fold there is no wide
    fold multiply to re-inflate limbs, so two passes pin the worst case at
    8192 + 607 = 8799 for any input with limbs < 2^15 (bound propagation:
    tests/test_pallas_curve.py::test_lazy_reduction_bounds)."""
    for _ in range(rounds):
        lo = x & MASK
        hi = x >> B
        x = lo + jnp.concatenate([hi[-1:] * FOLD, hi[:-1]], axis=0)
    return x


def _finalize(cols):
    """Lite reduction of schoolbook columns (|col| < 2^31, width 2*NL-1):
    3 carry passes make every limb (incl. the fold tail) small enough for
    one wide fold, then 2 wrap passes pin the 8799 invariant.  Replaces the
    r2 four-round redistribute/fold ladder — ~30% fewer reduction ops per
    field mul, worst-case output bound unchanged (8799)."""
    cols = _redistribute(cols, 3)
    cols = _fold(cols)
    return _wred(cols, 2)


def _lazy(cols):
    """Normalize width-NL sums/biased-differences (limbs < 2^15 + 2^14) to
    the 8799 invariant.  Input width must be exactly NL."""
    return _wred(cols, 2)


def _mul(a, b):
    """Schoolbook on [NL, n] columns: NL broadcast-MACs, each a full-width
    VPU op (row of a broadcast against all of b).  Shifted accumulation is
    concat + tree-add (Pallas TPU has no scatter-add lowering)."""
    n = a.shape[1]
    width = 2 * NL - 1
    terms = []
    for i in range(NL):
        prod = a[i:i + 1, :] * b                       # [NL, n]
        parts = []
        if i:
            parts.append(jnp.zeros((i, n), dtype=jnp.int32))
        parts.append(prod)
        if width - NL - i:
            parts.append(jnp.zeros((width - NL - i, n), dtype=jnp.int32))
        terms.append(jnp.concatenate(parts, axis=0))
    while len(terms) > 1:
        nxt = [terms[j] + terms[j + 1] for j in range(0, len(terms) - 1, 2)]
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    return _finalize(terms[0])


def _padd_body(bias, d2, x1, y1, z1, t1, x2, y2, z2, t2):
    a = _mul(_lazy(y1 + bias - x1), _lazy(y2 + bias - x2))
    b = _mul(_lazy(y1 + x1), _lazy(y2 + x2))
    c = _mul(_mul(t1, t2), d2)
    d = _lazy(_mul(z1, z2) * 2)
    e = _lazy(b + bias - a)
    f = _lazy(d + bias - c)
    g = _lazy(d + c)
    h = _lazy(b + a)
    return (_mul(e, f), _mul(g, h), _mul(f, g), _mul(e, h))


def _madd_body(bias, x1, y1, z1, t1, x2, y2, t2d2):
    """Mixed addition: operand 2 is affine (Z2=1) with T pre-scaled by 2d
    (t2d2 = x2*y2*2d mod p).  7 full muls vs the unified padd's 9 — this is
    the serial-bucket MSM's inner loop (ops/msm_serial.py), the TPU
    equivalent of dalek's AVX2 bucket accumulation."""
    a = _mul(_lazy(y1 + bias - x1), _lazy(y2 + bias - x2))
    b = _mul(_lazy(y1 + x1), _lazy(y2 + x2))
    c = _mul(t1, t2d2)
    d = _lazy(z1 + z1)
    e = _lazy(b + bias - a)
    f = _lazy(d + bias - c)
    g = _lazy(d + c)
    h = _lazy(b + a)
    return (_mul(e, f), _mul(g, h), _mul(f, g), _mul(e, h))


def _padd_kernel(bias, d2, x1, y1, z1, t1, x2, y2, z2, t2,
                 ox, oy, oz, ot):
    r = _padd_body(bias[:], d2[:], x1[:], y1[:], z1[:], t1[:],
                   x2[:], y2[:], z2[:], t2[:])
    ox[:], oy[:], oz[:], ot[:] = r


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


@jax.jit
def padd_cols(p, q):
    """p, q: pytrees of [NL, n] int32, any n >= 1.
    Returns padd(p, q) in the same layout, fused in one Pallas pass.
    n not a multiple of BLOCK is padded up (pad lanes compute garbage on
    zero limbs, harmless) and sliced back off."""
    n = p[0].shape[1]
    # whole-array blocks are always Mosaic-legal; tiles narrower than the
    # array must be lane-aligned.  n < BLOCK with grid (n // BLOCK,) == (0,)
    # would run ZERO kernel instances and return garbage on hardware.
    blk = n if n < BLOCK else BLOCK
    if n % blk:
        np_ = -(-n // blk) * blk
        pad = lambda x: jnp.pad(x, ((0, 0), (0, np_ - n)))
        out = padd_cols(tuple(pad(x) for x in p), tuple(pad(x) for x in q))
        return tuple(x[:, :n] for x in out)
    grid = (n // blk,)
    spec = pl.BlockSpec((NL, blk), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((NL, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _padd_kernel,
        grid=grid,
        in_specs=[cspec, cspec] + [spec] * 8,
        out_specs=[spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((NL, n), jnp.int32)] * 4,
        interpret=_use_interpret(),
    )(jnp.asarray(_SUB_BIAS_COL), jnp.asarray(_D2_COL), *p, *q)
    return tuple(out)


def to_cols(p):
    """[n, NL] pytree -> [NL, n] pytree."""
    return tuple(jnp.swapaxes(x, -1, -2) for x in p)


def from_cols(p):
    return tuple(jnp.swapaxes(x, -1, -2) for x in p)
