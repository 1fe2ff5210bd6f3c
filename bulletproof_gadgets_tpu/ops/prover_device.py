"""Device-side construction of the R1CS prover's polynomial vectors.

Everything O(n) between the y/z challenges and the IPA — the six t-poly
inner products and the l(x)/r(x) vector build (dalek r1cs prover internals,
reached from the reference at /root/reference/src/prove.rs:79) — runs as two
jits over [padded_n, NW] limb arrays.  l_vec/r_vec never leave the device:
they are handed to ops/ipa_device as the IPA's initial a/b state.

Row convention: all arrays are padded_n rows; rows >= n carry the padding
the protocol wants (zeros for the l-parts, -y^i for r0), so the device
functions are uniform over rows.
"""
import numpy as np
import jax
import jax.numpy as jnp

from . import flvec
from .fl import mont_mul, NW, R as _R
from ..core.scalar import L


def int_powers(base: int, count: int):
    """[1, base, base^2, ...] as raw ints (host; ~60ns/mul)."""
    out = [1] * count
    cur = 1
    for i in range(1, count):
        cur = cur * base % L
        out[i] = cur
    return out


class ProverVectors:
    """Uploads the witness/constraint vectors once, then serves the t-poly
    sums and the l/r build."""

    def __init__(self, aL, aR, aO, sL, sR, wL, wR, wO, y: int, y_inv: int,
                 padded_n: int):
        n = len(aL)
        pad = padded_n - n

        def up(v):
            if isinstance(v, jnp.ndarray):      # device limb rows (flatten)
                if pad:
                    return jnp.concatenate(
                        [v, jnp.zeros((pad, NW), jnp.int32)], axis=0)
                return v
            return jnp.asarray(flvec.to_limbs([x % L for x in v]
                                              + [0] * pad))

        self.aL = up(aL)
        self.aR = up(aR)
        self.aO = up(aO)
        self.sL = up(sL)
        self.sR = up(sR)
        self.wL = up(wL)
        self.wR = up(wR)
        self.wO = up(wO)
        # y / y^-1 power series built on device (flvec.powers_mont): the
        # host int_powers + to_mont pipeline is ~0.4 us/element
        self.y_m = flvec.powers_mont(y, padded_n)
        self.yinv_m = flvec.powers_mont(y_inv, padded_n)
        self.n = n
        self.padded_n = padded_n
        self._parts = _build_parts(self.aL, self.aR, self.aO,
                                   self.sL, self.sR,
                                   self.wL, self.wR, self.wO,
                                   self.y_m, self.yinv_m)

    def t_poly_device(self):
        """The nine t-poly partial sums as a [9, NW] DEVICE array — fetch
        it (possibly batched across proofs, lang.batch) and finish with
        t_poly_from."""
        return _t_sums(*self._parts)

    @staticmethod
    def t_poly_from(arr):
        """[9, NW] host array -> six t-poly coefficients as ints."""
        i = flvec.limbs_to_ints(arr)
        return (i[0], (i[1] + i[2]) % L, (i[3] + i[4]) % L,
                (i[5] + i[6]) % L, i[7], i[8])

    def t_poly(self):
        """Six t-poly coefficients (t1..t6) as canonical ints."""
        return self.t_poly_from(np.asarray(self.t_poly_device()))

    def lr(self, x: int):
        """l(x), r(x) as device [padded_n, NW] arrays (the IPA's a/b)."""
        x_m = jnp.asarray(flvec.to_mont([x % L]))[0]
        xx_m = jnp.asarray(flvec.to_mont([x * x % L]))[0]
        xxx_m = jnp.asarray(flvec.to_mont([x * x % L * x % L]))[0]
        return _lr(*self._parts, x_m, xx_m, xxx_m)


@jax.jit
def _build_parts(aL, aR, aO, sL, sR, wL, wR, wO, y_m, yinv_m):
    """(l1, l2, l3, r0r1r3-stack) — the reusable round-independent parts.
    y_std (the std-form y^i vector for r0's pad rows) is derived from y_m
    in-graph so the whole prep is ONE jit (the eager mont_mul chain cost
    ~120 ms/proof in host dispatch)."""
    n_rows = aL.shape[0]
    one_std = jnp.zeros((1, NW), jnp.int32).at[0, 0].set(1)
    y_std = mont_mul(jnp.broadcast_to(one_std, (n_rows, NW)), y_m)
    l1 = flvec.add(aL, mont_mul(yinv_m, wR))
    l2 = aO
    l3 = sL
    r0 = flvec.sub(wO, y_std)
    r1 = flvec.add(mont_mul(y_m, aR), wL)
    r3 = mont_mul(y_m, sR)
    return l1, l2, l3, r0, r1, r3


@jax.jit
def _t_sums(l1, l2, l3, r0, r1, r3):
    """[8, NW]: t1 | t2a t2b | t3a t3b | t4a t4b | t5  (t6 computed too)."""
    return jnp.stack([
        flvec.inner(l1, r0),            # t1
        flvec.inner(l1, r1),            # t2a
        flvec.inner(l2, r0),            # t2b
        flvec.inner(l2, r1),            # t3a
        flvec.inner(l3, r0),            # t3b
        flvec.inner(l1, r3),            # t4a
        flvec.inner(l3, r1),            # t4b
        flvec.inner(l2, r3),            # t5
        flvec.inner(l3, r3),            # t6
    ])


@jax.jit
def _lr(l1, l2, l3, r0, r1, r3, x_m, xx_m, xxx_m):
    """l = l1*x + l2*x^2 + l3*x^3;  r = r0 + r1*x + r3*x^3.
    Pad rows (>= n): l-parts are zero -> l = 0; r1/r3 zero and r0 = -y^i
    -> r = -y^i, exactly dalek's padding."""
    l = flvec.add(flvec.add(mont_mul(l1, x_m), mont_mul(l2, xx_m)),
                  mont_mul(l3, xxx_m))
    r = flvec.add(flvec.add(r0, mont_mul(r1, x_m)), mont_mul(r3, xxx_m))
    return l, r
