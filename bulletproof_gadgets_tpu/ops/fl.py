"""Batched scalar-field F_l arithmetic for TPU (l = Ristretto255 group
order), in Montgomery form with R = 2^273.

Limb geometry: NW = 21 little-endian limbs of 13 bits (273-bit capacity),
int32 lanes — one limb more than ops/fp.py.  The extra headroom is the whole
design: lazily-reduced values stay < 2^255 while the capacity is 2^273, so
  * Montgomery closure needs no conditional subtraction:
    u = (a*b + m*N)/R < 2^510/2^273 + l < 2^253 for any inputs < 2^255;
  * normalized high limbs beyond the value bound are provably zero, so limb
    slices can never drop a stuck carry (the failure mode that bit the F_p
    pipeline).
The division by R is a 21-limb shift plus an exact {0,1} carry: the low half
is == 0 mod R and, under nearly-normalized limbs, is either 0 or exactly R.

Backs the batched MiMC sponge kernel (models/mimc.py semantics) and future
on-device IPA scalar folds.  Oracle tests: tests/test_ops_fl.py.
"""

import numpy as np
import jax.numpy as jnp

from .fp import B, MASK, _redistribute
from ..core.scalar import L

NW = 21                  # limbs
R_BITS = B * NW          # 273
R = 1 << R_BITS
N_PRIME = (-pow(L, -1, R)) % R
R2 = (R * R) % L


def _int_to_limbs(v: int, width: int = NW) -> np.ndarray:
    return np.array([(v >> (B * i)) & MASK for i in range(width)],
                    dtype=np.int32)


_N_LIMBS = _int_to_limbs(L)
_NPRIME_LIMBS = _int_to_limbs(N_PRIME)


def to_limbs_np(values) -> np.ndarray:
    out = np.empty((len(values), NW), dtype=np.int32)
    for i, v in enumerate(values):
        for j in range(NW):
            out[i, j] = (v >> (B * j)) & MASK
    return out


def from_limbs(arr) -> list:
    a = np.asarray(arr)
    flat = a.reshape(-1, NW)
    out = []
    for row in flat:
        v = 0
        for j in range(NW - 1, -1, -1):
            v = (v << B) + int(row[j])  # + not |: tolerate lazy limbs >= 2^B
        out.append(v % L)
    return out


def _mul_cols(a, b, max_k=None):
    """Schoolbook columns (width 2*NW-1), optionally truncated to max_k."""
    width = 2 * NW - 1
    nd = max(a.ndim, b.ndim)
    if max_k is None:
        max_k = width
    terms = []
    for i in range(NW):
        t = a[..., i:i + 1] * b
        padded = jnp.pad(t, [(0, 0)] * (nd - 1) + [(i, width - NW - i)])
        terms.append(padded[..., :max_k])
    while len(terms) > 1:
        nxt = [terms[j] + terms[j + 1] for j in range(0, len(terms) - 1, 2)]
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]


def mont_mul(a, b):
    """(a * b / R) mod l.  Inputs: limb arrays with value < 2^255 and limbs
    < ~2^13.2; output value < 2^253, limbs nearly normalized."""
    t = _redistribute(_mul_cols(a, b), 3)            # [..., 44]
    t_lo = t[..., :NW]
    # m = (t_lo * N') mod R: low 21 columns, truncation == mod R
    m = _redistribute(_mul_cols(t_lo, _NPRIME_LIMBS, max_k=NW), 3)[..., :NW]
    mn = _redistribute(_mul_cols(m, _N_LIMBS), 3)    # [..., 44]
    width = max(t.shape[-1], mn.shape[-1])

    def pad_to(x):
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, width - x.shape[-1])])

    s = _redistribute(pad_to(t) + pad_to(mn), 2)
    low = s[..., :NW]
    hi = s[..., NW:]
    # low half == 0 mod R; under nearly-normalized limbs it is 0 or exactly R
    carry = (jnp.max(low, axis=-1, keepdims=True) > 0).astype(jnp.int32)
    hi = hi.at[..., 0:1].add(carry)
    # value(hi) < 2^253 << 2^260, so limbs >= 20 vanish after normalization
    hi = _redistribute(hi, 2)[..., :NW]
    return hi


def add(a, b):
    """(a + b), lazily reduced (no mod: value grows by one bit; callers
    interleave with mont_mul which renormalizes below 2^253)."""
    return _redistribute(a + b, 1)[..., :NW]


def add_const(a, const_limbs):
    return _redistribute(a + const_limbs, 1)[..., :NW]


def to_mont_np(values) -> np.ndarray:
    return to_limbs_np([v * R % L for v in values])


def from_mont(arr) -> list:
    r_inv = pow(R, -1, L)
    return [v * r_inv % L for v in from_limbs(arr)]


def zeros(shape=()):
    return jnp.zeros(tuple(shape) + (NW,), dtype=jnp.int32)
