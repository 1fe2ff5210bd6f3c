"""Device-side construction of the verifier's mega-MSM scalar vector.

dalek's verifier folds everything into one multiscalar multiplication
(invoked by the reference at /root/reference/src/verify.rs:71); the O(n)
scalars on the generator table — the IPA s-vector and the g/h per-generator
coefficients — are built here on the TPU and returned directly as signed
digits for the serial-bucket MSM.  Only delta (a single scalar the host
needs for the B-slot coefficient) is read back as limbs.
"""
import numpy as np
import jax
import jax.numpy as jnp

from . import flvec
from .fl import mont_mul, NW
from ..core.scalar import L


def _s_vector(allinv_m, u_sq_m):
    """IPA verification s-vector, std form [2^lg_n, NW].
    allinv_m: [NW] mont(prod of u_inv); u_sq_m: [lg_n, NW] mont(u_j^2).
    s[0] = allinv; s[i + 2^j] = s[i] * u_sq[lg_n-1-j]."""
    lg_n = u_sq_m.shape[0]
    one = np.zeros((1, NW), dtype=np.int32)
    one[0, 0] = 1
    s = mont_mul(jnp.asarray(one), allinv_m[None, :])   # [1, NW] std
    for j in range(lg_n):
        s = jnp.concatenate([s, mont_mul(s, u_sq_m[lg_n - 1 - j][None, :])],
                            axis=0)
    return s


def table_digits_dev(ynw_d, wL_d, wO_d, y_inv: int, x: int, a: int, b: int,
                     u: int, allinv: int, u_sq, n: int, n1: int,
                     padded_n: int, c_B: int, c_Bb: int):
    """Device-native variant of table_digits: ynw/wL/wO arrive as [n, NW]
    std limb rows already on device (ops/flatten + a mont_mul), so no host
    int conversion touches the O(n) vectors.  y^-i powers and the u_or_1
    vector are built on device too."""
    pad = padded_n - n

    def padrow(v):
        return jnp.pad(v, ((0, pad), (0, 0))) if pad else v

    wL_p = padrow(wL_d)
    wO_p = padrow(wO_d)
    ynw_p = padrow(ynw_d)
    yinv_m = flvec.powers_mont(y_inv % L, padded_n)
    one_m = flvec.powers_mont(1, 1)[0]
    u_m = jnp.asarray(flvec.to_mont([u % L]))[0]
    u1_m = jnp.concatenate(
        [jnp.broadcast_to(one_m[None, :], (n1, NW)),
         jnp.broadcast_to(u_m[None, :], (padded_n - n1, NW))], axis=0)

    x_m = jnp.asarray(flvec.to_mont([x % L]))[0]
    a_m = jnp.asarray(flvec.to_mont([a % L]))[0]
    b_m = jnp.asarray(flvec.to_mont([b % L]))[0]
    allinv_m = jnp.asarray(flvec.to_mont([allinv % L]))[0]
    u_sq_m = jnp.asarray(flvec.to_mont([v % L for v in u_sq]))
    tail = jnp.asarray(flvec.to_limbs([c_B % L, c_Bb % L]))

    return _table_digits(wL_p, wO_p, ynw_p, yinv_m, u1_m,
                         x_m, a_m, b_m, allinv_m, u_sq_m, tail)


def table_digits(ynw, wL, wO, y_inv: int, x: int, a: int, b: int, u: int,
                 allinv: int, u_sq, n: int, n1: int, padded_n: int,
                 c_B: int, c_Bb: int):
    """Digits of the verifier's table MSM vector
    [g_scalars | h_scalars | c_B | c_Bb].

    ynw: length-n ints wR[i]*y^-i (host also needs them for delta);
    wL/wO: length-n int lists (flattened constraints); u_sq: the lg_n
    squared IPA challenges; c_B/c_Bb: the B / B_blinding coefficients
    (host-computed — they fold in delta).  Returns [64, padded_n*2+2] int8
    window-major digits ready for the schedule builder.
    """
    from .prover_device import int_powers

    pad = padded_n - n
    yi_pow = int_powers(y_inv % L, padded_n)

    wL_d = jnp.asarray(flvec.to_limbs([v % L for v in wL] + [0] * pad))
    wO_d = jnp.asarray(flvec.to_limbs([v % L for v in wO] + [0] * pad))
    ynw_d = jnp.asarray(flvec.to_limbs([v % L for v in ynw] + [0] * pad))
    yinv_m = jnp.asarray(flvec.to_mont(yi_pow))
    # u_or_1 in mont form: 1 for i < n1, u beyond
    u_or_1 = [1] * n1 + [u % L] * (padded_n - n1)
    u1_m = jnp.asarray(flvec.to_mont(u_or_1))

    x_m = jnp.asarray(flvec.to_mont([x % L]))[0]
    a_m = jnp.asarray(flvec.to_mont([a % L]))[0]
    b_m = jnp.asarray(flvec.to_mont([b % L]))[0]
    allinv_m = jnp.asarray(flvec.to_mont([allinv % L]))[0]
    u_sq_m = jnp.asarray(flvec.to_mont([v % L for v in u_sq]))
    tail = jnp.asarray(flvec.to_limbs([c_B % L, c_Bb % L]))

    return _table_digits(wL_d, wO_d, ynw_d, yinv_m, u1_m,
                         x_m, a_m, b_m, allinv_m, u_sq_m, tail)


@jax.jit
def _table_digits(wL, wO, ynw, yinv_m, u1_m, x_m, a_m, b_m,
                  allinv_m, u_sq_m, tail):
    s = _s_vector(allinv_m, u_sq_m)                     # [padded_n, NW] std
    s_rev = s[::-1]

    one = jnp.zeros((NW,), jnp.int32).at[0].set(1)
    g = mont_mul(flvec.sub(mont_mul(ynw, x_m), mont_mul(s, a_m)), u1_m)
    h_in = flvec.sub(flvec.add(mont_mul(wL, x_m), wO), mont_mul(s_rev, b_m))
    h = mont_mul(flvec.sub(mont_mul(h_in, yinv_m), one[None, :]), u1_m)

    vec = jnp.concatenate([g, h, tail], axis=0)         # [2*padded_n+2, NW]
    return flvec.digits_device(vec)
