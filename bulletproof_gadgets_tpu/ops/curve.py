"""Batched Edwards (Ristretto255) point operations for TPU.

Points are pytrees (X, Y, Z, T) of [..., NL]-int32 limb arrays in extended
coordinates on the a=-1 twisted Edwards curve.  The addition law is the
*unified* Hisil et al. formula (complete for Ristretto), so the same kernel
handles add, double, and identity — which is exactly what a data-parallel
bucket/scan MSM needs (no branches on the VPU).

Host oracle: core.ristretto.RistrettoPoint (tests/test_ops_curve.py).
"""

import numpy as np
import jax.numpy as jnp

from . import fp
from ..core.ristretto import P as _P, D as _D, RistrettoPoint

# 2*d mod p as limb constant (numpy: concrete under jit)
_D2_LIMBS = fp._int_to_limbs(2 * _D % _P)


def identity(shape=()):
    return (fp.zeros(shape), fp.ones(shape), fp.ones(shape), fp.zeros(shape))


def _stack4(a, b, c, d):
    return jnp.stack([a, b, c, d], axis=-2)


def padd(p, q):
    """Unified extended addition, graph-compact: the 8 full field muls run
    as TWO stacked fp.mul calls (the mul body is inlined O(log n) times by
    the MSM scans, so body size is compile-time critical; stacking also
    feeds the VPU larger fused batches)."""
    x1, y1, z1, t1 = p
    x2, y2, z2, t2 = q
    lhs = _stack4(fp.sub_lazy(y1, x1), fp.add_lazy(y1, x1), t1, z1)
    rhs = _stack4(fp.sub_lazy(y2, x2), fp.add_lazy(y2, x2), t2, z2)
    m = fp.mul(lhs, rhs)
    a, b = m[..., 0, :], m[..., 1, :]
    c = fp.mul(m[..., 2, :], jnp.asarray(_D2_LIMBS))  # (t1*t2) * 2d
    d = fp.add_lazy(m[..., 3, :], m[..., 3, :])
    e = fp.sub_lazy(b, a)
    f = fp.sub_lazy(d, c)
    g = fp.add_lazy(d, c)
    h = fp.add_lazy(b, a)
    m2 = fp.mul(_stack4(e, g, f, e), _stack4(f, h, g, h))
    return (m2[..., 0, :], m2[..., 1, :], m2[..., 2, :], m2[..., 3, :])


def pdouble(p):
    """Dedicated doubling via two stacked mul calls."""
    x1, y1, z1, _ = p
    xy = fp.add_lazy(x1, y1)
    m = fp.mul(_stack4(x1, y1, z1, xy), _stack4(x1, y1, z1, xy))
    a, b, zz, xysq = (m[..., 0, :], m[..., 1, :], m[..., 2, :],
                      m[..., 3, :])
    c = fp.add_lazy(zz, zz)
    h = fp.add_lazy(a, b)
    e = fp.sub_lazy(h, xysq)
    g = fp.sub_lazy(a, b)
    f = fp.add_lazy(c, g)
    m2 = fp.mul(_stack4(e, g, f, e), _stack4(f, h, g, h))
    return (m2[..., 0, :], m2[..., 1, :], m2[..., 2, :], m2[..., 3, :])


def pneg(p):
    x, y, z, t = p
    zero = fp.zeros(x.shape[:-1])
    return (fp.sub(zero, x), y, z, fp.sub(zero, t))


def pselect(mask, p, q):
    """mask: [...] bool — where(mask, p, q) componentwise."""
    m = mask[..., None]
    return tuple(jnp.where(m, a, b) for a, b in zip(p, q))


# -- host <-> device conversion -------------------------------------------

def points_to_device(points):
    """list[RistrettoPoint] -> device point pytree [n, NL].

    Limb conversion is cached per point object (points carry a _limbs attr
    lazily) so repeated MSMs over the same generator vectors pay once.
    """
    n = len(points)
    arr = np.empty((4, n, fp.NL), dtype=np.int32)
    B, MASK, NL = fp.B, fp.MASK, fp.NL
    for i, pt in enumerate(points):
        limbs = getattr(pt, "_limbs", None)
        if limbs is None:
            limbs = np.empty((4, NL), dtype=np.int32)
            for ci, v in enumerate((pt.X, pt.Y, pt.Z, pt.T)):
                for j in range(NL):
                    limbs[ci, j] = (v >> (B * j)) & MASK
            try:
                pt._limbs = limbs
            except AttributeError:
                pass
        arr[:, i, :] = limbs
    return (jnp.asarray(arr[0]), jnp.asarray(arr[1]),
            jnp.asarray(arr[2]), jnp.asarray(arr[3]))


def points_from_device(p):
    """device point pytree -> list[RistrettoPoint] (host)."""
    xs = fp.from_limbs(p[0])
    ys = fp.from_limbs(p[1])
    zs = fp.from_limbs(p[2])
    ts = fp.from_limbs(p[3])
    return [RistrettoPoint(x, y, z, t) for x, y, z, t in zip(xs, ys, zs, ts)]
