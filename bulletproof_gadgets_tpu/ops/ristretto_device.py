"""Ristretto255 compression and F_l challenge math on device.

Through round 3 every Fiat-Shamir round trip existed because point
compression (and the transcript) lived on the host: the MSM result had to
come back, be compressed and absorbed, and the challenge re-uploaded.
This module provides the device halves of that loop:

  * compress_cols: [4, NL, k] extended-coordinate limb columns (the MSM
    pipeline's native output, ops/msm_serial._horner_part) -> [k, 32]
    canonical RFC 9496 encodings as int32 byte values.  Same formulas as
    the host oracle core/ristretto.RistrettoPoint.compress (sqrt_ratio_m1
    via a (p-5)/8 = 2^252-3 square-and-multiply chain in a fori_loop).
  * challenge_limbs: [64] transcript PRF bytes -> F_l std limb row
    (Scalar::from_bytes_mod_order_wide semantics: lo + 2^256*hi mod l).
  * inv_mont / to_mont_dev: Fermat inversion u^(l-2) and Montgomery-form
    conversion for the IPA fold coefficients.

Oracle tests: tests/test_ristretto_device.py (vs core/ristretto and host
pow/invert).
"""
import numpy as np
import jax
import jax.numpy as jnp

from . import fp
from .fp import NL, B, MASK
from . import flvec
from .fl import mont_mul, NW, R as _R, R2 as _R2
from ..core.scalar import L
from ..core.ristretto import P, SQRT_M1, INVSQRT_A_MINUS_D

_SQRT_M1_ROW = fp.to_limbs_np([SQRT_M1])[0]
_INVSQRT_AMD_ROW = fp.to_limbs_np([INVSQRT_A_MINUS_D])[0]
def _msb_first_bits(e: int) -> np.ndarray:
    return np.array([(e >> i) & 1 for i in range(e.bit_length() - 1, -1, -1)],
                    dtype=np.int32)


_P58_BITS = _msb_first_bits(2 ** 252 - 3)      # MSB is bit 251
_L2_BITS = _msb_first_bits(L - 2)


def _nibbles_msb_first(e: int) -> np.ndarray:
    """4-bit windows of e, most-significant first, no leading zeros."""
    n_win = (e.bit_length() + 3) // 4
    return np.array([(e >> (4 * i)) & 15 for i in range(n_win - 1, -1, -1)],
                    dtype=np.int32)


_L2_NIBS = _nibbles_msb_first(L - 2)           # 64 windows, MSB first
_K256 = flvec.to_limbs([(1 << 256) * _R % L])[0]   # mont_mul(hi, K) = hi*2^256
_R2_ROW = flvec.to_limbs([_R2])[0]
_RMODL_ROW = flvec.to_limbs([_R % L])[0]


# ---------------------------------------------------------------------------
# F_p canonicalization + byte encoding

def canonical(x):
    """[.., NL] F_p limbs (value < 2^261, any rep) -> exact canonical limbs
    (< p, limbs < 2^13)."""
    # exact carry propagation (sequential over the 20 limbs)
    xs = jnp.moveaxis(x, -1, 0)

    def carry(c, limb):
        v = limb + c
        return v >> B, v & MASK

    top, limbs = jax.lax.scan(carry, jnp.zeros_like(xs[0]), xs)
    # top carry holds bits >= 260; limb 19 bits 247..259.  Fold bits >= 255:
    # value = lo + 2^255*hi  ==  lo + 19*hi (mod p)
    l19 = limbs[19]
    hi = (l19 >> 8) + (top << 5)
    lo19 = l19 & 0xFF
    x2 = jnp.moveaxis(limbs.at[19].set(lo19), 0, -1)
    x2 = x2.at[..., 0].add(19 * hi)             # < 2^255 + 19*2^10
    xs2 = jnp.moveaxis(x2, -1, 0)
    _, limbs2 = jax.lax.scan(carry, jnp.zeros_like(xs2[0]), xs2)
    # conditional subtract: x >= p  <=>  bit 255 of (x + 19) is set
    t = limbs2.at[0].add(19)
    _, t = jax.lax.scan(carry, jnp.zeros_like(t[0]), t)
    ge = (t[19] >> 8) > 0
    out = jnp.where(ge[None], t.at[19].set(t[19] & 0xFF), limbs2)
    return jnp.moveaxis(out, 0, -1)


def canonical_bytes(xc):
    """canonical limbs [.., NL] -> [.., 32] little-endian byte values."""
    outs = []
    for i in range(32):
        bit = 8 * i
        j, r = bit // B, bit % B
        word = xc[..., j]
        if j + 1 < NL:
            word = word | (xc[..., j + 1] << B)
        outs.append((word >> r) & 0xFF)
    return jnp.stack(outs, axis=-1)


def _is_neg(xc):
    """canonical limbs -> 1 if odd (dalek is_negative)."""
    return xc[..., 0] & 1


def _eq(ac, bc):
    """canonical limbs equality -> bool [..]"""
    return jnp.all(ac == bc, axis=-1)


def _abs(x):
    """x (any rep) -> canonical |x| (negate if odd)."""
    xc = canonical(x)
    neg = canonical(fp.sub(jnp.zeros_like(x), x))
    return jnp.where(_is_neg(xc)[..., None] == 1, neg, xc)


def pow_p58(x):
    """x^(2^252 - 3) mod p; x [.., NL] nearly-normalized."""
    bits = jnp.asarray(_P58_BITS)

    def body(i, acc):
        acc = fp.mul(acc, acc)
        return jnp.where(bits[i], fp.mul(acc, x), acc)

    return jax.lax.fori_loop(1, _P58_BITS.shape[0],
                             body, x)   # MSB is 1: acc starts at x


def sqrt_ratio_m1(u, v):
    """(was_square [..], +sqrt(u/v) canonical [.., NL]) — RFC 9496."""
    v3 = fp.mul(fp.mul(v, v), v)
    v7 = fp.mul(fp.mul(v3, v3), v)
    r = fp.mul(fp.mul(u, v3), pow_p58(fp.mul(u, v7)))
    check = canonical(fp.mul(v, fp.mul(r, r)))
    sqrt_m1 = jnp.asarray(_SQRT_M1_ROW)
    uc = canonical(u)
    neg_u = canonical(fp.sub(jnp.zeros_like(u), u))
    neg_u_i = canonical(fp.mul(fp.sub(jnp.zeros_like(u), u), sqrt_m1))
    correct = _eq(check, uc)
    flipped = _eq(check, neg_u)
    flipped_i = _eq(check, neg_u_i)
    flip = flipped | flipped_i
    r = jnp.where(flip[..., None], fp.mul(r, sqrt_m1), r)
    return correct | flipped, _abs(r)


def compress_rows(x, y, z, t):
    """[k, NL] extended coordinates -> [k, 32] int32 encodings (RFC 9496
    ENCODE; mirrors core/ristretto.RistrettoPoint.compress)."""
    u1 = fp.mul(fp.add(z, y), fp.sub(z, y))
    u2 = fp.mul(x, y)
    one = jnp.broadcast_to(
        jnp.asarray(fp.to_limbs_np([1])[0]), u1.shape)
    _, invsqrt = sqrt_ratio_m1(one, fp.mul(u1, fp.mul(u2, u2)))
    den1 = fp.mul(invsqrt, u1)
    den2 = fp.mul(invsqrt, u2)
    z_inv = fp.mul(fp.mul(den1, den2), t)
    sqrt_m1 = jnp.asarray(_SQRT_M1_ROW)
    ix = fp.mul(x, sqrt_m1)
    iy = fp.mul(y, sqrt_m1)
    ench = fp.mul(den1, jnp.asarray(_INVSQRT_AMD_ROW))
    rotate = _is_neg(canonical(fp.mul(t, z_inv)))[..., None] == 1
    xf = jnp.where(rotate, iy, x)
    yf = jnp.where(rotate, ix, y)
    den_inv = jnp.where(rotate, ench, den2)
    neg_y = fp.sub(jnp.zeros_like(yf), yf)
    yf = jnp.where(_is_neg(canonical(fp.mul(xf, z_inv)))[..., None] == 1,
                   neg_y, yf)
    s = _abs(fp.mul(den_inv, fp.sub(z, yf)))
    return canonical_bytes(s)


def compress_cols(cols):
    """MSM pipeline output [4, NL, k] -> [k, 32] int32 byte encodings."""
    x = jnp.moveaxis(cols[0], 0, -1)
    y = jnp.moveaxis(cols[1], 0, -1)
    z = jnp.moveaxis(cols[2], 0, -1)
    t = jnp.moveaxis(cols[3], 0, -1)
    return compress_rows(x, y, z, t)


# ---------------------------------------------------------------------------
# F_l challenge derivation + inversion (device)

def bytes_to_fl_limbs(b32):
    """[.., 32] int32 bytes (LE) -> [.., NW] F_l limbs (raw value < 2^256)."""
    outs = []
    for j in range(NW):
        bit = 13 * j
        off, r = bit >> 3, bit & 7
        word = b32[..., off] if off < 32 else jnp.zeros_like(b32[..., 0])
        if off + 1 < 32:
            word = word | (b32[..., off + 1] << 8)
        if off + 2 < 32:
            word = word | (b32[..., off + 2] << 16)
        outs.append((word >> r) & MASK)
    return jnp.stack(outs, axis=-1)


def challenge_limbs(b64):
    """[64] transcript PRF bytes -> [NW] std F_l limbs == value mod l
    (from_bytes_mod_order_wide: lo + 2^256 * hi)."""
    lo = bytes_to_fl_limbs(b64[:32])
    hi = bytes_to_fl_limbs(b64[32:])
    hi_red = mont_mul(hi[None, :], jnp.asarray(_K256)[None, :])[0]
    return flvec.add(lo, hi_red)               # value < 2^256 + 2^253


def to_mont_dev(x_std):
    """std limbs -> mont form (x*R mod l)."""
    return mont_mul(x_std, jnp.broadcast_to(jnp.asarray(_R2_ROW),
                                            x_std.shape))


def inv_mont(x_std):
    """std limbs [NW] -> x^(l-2) in MONT form (the fold-ready u_inv).

    4-ary windowed chain: a 16-entry power table (15 dependent muls) then
    63 windows of 4 squarings + 1 table mul — ~330 dependent multiplies
    instead of the 505 of the naive square-and-multiply ladder.  This
    chain is pure latency inside every fused IPA round's Fiat-Shamir step
    (it cannot overlap the MSM: the challenge depends on L/R), so the
    dependent-op count is the cost."""
    x_m = to_mont_dev(x_std[None, :])[0]

    # power table x^0..x^15 (mont form; x^0 = R)
    def tab_body(i, t):
        return t.at[i].set(mont_mul(t[i - 1], x_m))

    table = jnp.zeros((16, NW), jnp.int32).at[0].set(
        jnp.asarray(_RMODL_ROW)).at[1].set(x_m)
    table = jax.lax.fori_loop(2, 16, tab_body, table)

    nibs = jnp.asarray(_L2_NIBS)

    def body(i, acc):
        for _ in range(4):
            acc = mont_mul(acc, acc)
        return mont_mul(acc, table[nibs[i]])

    return jax.lax.fori_loop(1, _L2_NIBS.shape[0], body, table[nibs[0]])
