"""Device re-materialization of folded IPA generator tables.

The fused IPA (ops/ipa_fused.py) uses *collapsed folding*: generators never
move, the fold state lives in per-generator coefficient vectors, and every
round's L/R is an MSM over the ENTIRE original table.  That makes each of
the lg(n) rounds cost ~32*m bucket additions — constant per round — where
dalek's fold (inner_product_proof.rs) halves the working set every round.

This module closes that gap: after d collapsed rounds the virtual generator
G'_i equals  sum_{k<2^d} gc[i + k*n'] * G[i + k*n']  (n' = n/2^d), so the
folded table can be MATERIALIZED on device as n' batched 2^d-term
multi-scalar ladders sharing their doubling chain:

  * scalars: the collapsed coefficients, recoded to 64 signed 4-bit windows
    on device (the +0x888..8 bias trick — no carry chain);
  * per input point, 8 odd+even multiples 1P..8P in cached Niels form
    (precomputed with ~13 vector point ops per input);
  * one Pallas ladder kernel walks the 64 windows high-to-low: 4 doublings
    + 2^d select-and-add steps per window, accumulators VMEM-resident;
  * batch Z-inversion (Fermat chain, 254 sq + 11 mul, all lanes at once)
    converts the outputs back to the int16 affine row format the bucket
    MSM consumes (ops/msm_serial.prep_source layout).

Cost ~ (64 + 256/2^d + ~15) point-ops per INPUT table point — about two
full MSM rounds — after which every subsequent round runs on a table 2^d
times smaller.  ipa_fused folds every BPG_TPU_IPA_FOLD_AT (default 4)
rounds while the virtual size stays >= BPG_TPU_IPA_FOLD_MIN.

Byte/transcript output of the IPA is unchanged (the materialized table
IS the virtual table dalek folds in place); oracle: tests/test_ipa_fused.py
with folding forced on at small sizes.

Role in the reference stack: dalek inner_product_proof.rs fold step
(G_hi*u_inv + G_lo*u per round), invoked from prover.prove
(/root/reference/src/prove.rs:79).
"""
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import fp
from .fl import mont_mul, NW
from .pallas_curve import (_mul as _fpmul, _lazy, _wred, _SUB_BIAS_COL,
                           _D2_COL, _use_interpret)

NL = fp.NL
B = fp.B
MASK = fp.MASK

# +C recode bias: 64 base-16 digits of 8 -> windows of s+C are the signed
# digits of s shifted by +8 (exact, no carries: sum (e_w - 8) 16^w == s).
_C_RECODE = 8 * ((1 << 256) - 1) // 15
_C_LIMBS = np.array([(_C_RECODE >> (B * i)) & MASK for i in range(NW)],
                    dtype=np.int32)
_ONE_FL = np.zeros((NW,), dtype=np.int32)
_ONE_FL[0] = 1  # integer 1 in F_l limbs (std form): mont_mul(x_mont, 1) = x


def fold_params():
    """(enabled, fold_every_d_rounds, min_virtual_n) from the environment."""
    on = os.environ.get("BPG_TPU_IPA_FOLD", "1") == "1"
    d = int(os.environ.get("BPG_TPU_IPA_FOLD_AT", "4"))
    # fold while the POST-fold table keeps >= min_n generators: below ~512
    # the per-round cost is all fixed overhead (fs chain + dispatch) and a
    # smaller table buys nothing
    min_n = int(os.environ.get("BPG_TPU_IPA_FOLD_MIN", "512"))
    return on, d, min_n


# ---------------------------------------------------------------------------
# signed 4-bit window recode (device)

def digits4_dev(std_rows):
    """[n, NW] std F_l limbs (value < 2^253, any rep) -> [64, n] int32
    window values e_w in [0, 15]; the ladder digit is e_w - 8."""
    xs = jnp.moveaxis(std_rows, -1, 0)                  # [NW, n]

    def carry(c, limb):
        v = limb + c
        return v >> B, v & MASK

    _, limbs = jax.lax.scan(carry, jnp.zeros_like(xs[0]), xs)
    # add the recode bias and re-normalize (value < 2^253 + 2^255.1 < 2^256)
    biased = limbs + jnp.asarray(_C_LIMBS)[:, None]
    _, limbs = jax.lax.scan(carry, jnp.zeros_like(biased[0]), biased)
    wins = []
    for w in range(64):
        bit = 4 * w
        j, r = bit // B, bit % B
        word = limbs[j]
        if j + 1 < NW:
            word = word | (limbs[j + 1] << B)
        wins.append((word >> r) & 15)
    return jnp.stack(wins)                              # [64, n]


# ---------------------------------------------------------------------------
# point helpers (cols layout [NL, lanes], jnp level)

def _dbl(bias, x, y, z, t):
    """Extended-coordinate doubling, a = -1 (dbl-2008-hwcd with the whole
    output scaled by -1 — projectively identical; 8 muls)."""
    a = _fpmul(x, x)
    b = _fpmul(y, y)
    zz = _fpmul(z, z)
    c = _lazy(zz + zz)
    ss = _fpmul(_lazy(x + y), _lazy(x + y))
    e = _lazy(_lazy(ss + bias - a) + bias - b)
    g = _lazy(b + bias - a)
    f = _lazy(c + bias - g)
    h = _lazy(a + b)
    return _fpmul(e, f), _fpmul(g, h), _fpmul(f, g), _fpmul(e, h)


def _padd(bias, d2, x1, y1, z1, t1, x2, y2, z2, t2):
    """Unified extended addition (mirrors pallas_curve._padd_body)."""
    a = _fpmul(_lazy(y1 + bias - x1), _lazy(y2 + bias - x2))
    b = _fpmul(_lazy(y1 + x1), _lazy(y2 + x2))
    c = _fpmul(_fpmul(t1, t2), d2)
    d = _lazy(_fpmul(z1, z2) * 2)
    e = _lazy(b + bias - a)
    f = _lazy(d + bias - c)
    g = _lazy(d + c)
    h = _lazy(b + a)
    return (_fpmul(e, f), _fpmul(g, h), _fpmul(f, g), _fpmul(e, h))


def _padd_cached_body(bias, x1, y1, z1, t1, dc, sc, z2c, t2dc):
    """acc (extended) + cached operand (y2-x2, y2+x2, 2*z2, t2*2d): 8 muls."""
    a = _fpmul(_lazy(y1 + bias - x1), dc)
    b = _fpmul(_lazy(y1 + x1), sc)
    c = _fpmul(t1, t2dc)
    d = _fpmul(z1, z2c)
    e = _lazy(b + bias - a)
    f = _lazy(d + bias - c)
    g = _lazy(d + c)
    h = _lazy(b + a)
    return (_fpmul(e, f), _fpmul(g, h), _fpmul(f, g), _fpmul(e, h))


def _sq_n(x, n: int):
    return jax.lax.fori_loop(0, n, lambda i, a: _fpmul(a, a), x)


def inv_fp_cols(z):
    """Batched F_p inversion z^(p-2), [NL, lanes] cols: the classic
    curve25519 chain (254 squarings + 11 multiplies), all lanes at once."""
    z2 = _fpmul(z, z)
    z9 = _fpmul(_sq_n(z2, 2), z)
    z11 = _fpmul(z9, z2)
    z_5_0 = _fpmul(_fpmul(z11, z11), z9)          # 2^5 - 2^0
    z_10_0 = _fpmul(_sq_n(z_5_0, 5), z_5_0)
    z_20_0 = _fpmul(_sq_n(z_10_0, 10), z_10_0)
    z_40_0 = _fpmul(_sq_n(z_20_0, 20), z_20_0)
    z_50_0 = _fpmul(_sq_n(z_40_0, 10), z_10_0)
    z_100_0 = _fpmul(_sq_n(z_50_0, 50), z_50_0)
    z_200_0 = _fpmul(_sq_n(z_100_0, 100), z_100_0)
    z_250_0 = _fpmul(_sq_n(z_200_0, 50), z_50_0)
    return _fpmul(_sq_n(z_250_0, 5), z11)         # 2^255 - 21 = p - 2


# ---------------------------------------------------------------------------
# the ladder kernel

def _ladder_kernel(bias, dig_ref, mult_ref, ox, oy, oz, ot, *, k_terms: int):
    """Grid (lane_blocks,): the whole 64-window ladder runs in-kernel with
    VMEM-resident accumulators.  Per window: 4 doublings + k_terms
    select-and-cached-add.  mult_ref block [K, 8*4*NL, blk]; dig_ref block
    [64*K, blk] (row w*K + k = window w's e-value 0..15 for term k) — all
    dynamic indexing is leading-dim (the Mosaic-supported pattern)."""
    b = bias[:]
    row = jax.lax.broadcasted_iota(jnp.int32, ox.shape, 0)
    one = (row == 0).astype(jnp.int32)
    acc = (jnp.zeros_like(ox[:]), one, one, jnp.zeros_like(ox[:]))

    def term_body(wi, k, acc):
        e = dig_ref[(63 - wi) * k_terms + k]        # [blk]
        neg = e < 8
        absd = jnp.where(neg, 8 - e, e - 8)         # 0..8
        # select the |digit| multiple in cached form (identity for 0)
        two = 2 * one
        sel = [one, one, two, jnp.zeros_like(one)]  # cached identity
        for m in range(8):
            pick = (absd == (m + 1))[None, :]
            for c in range(4):
                cand = mult_ref[k, (m * 4 + c) * NL:(m * 4 + c + 1) * NL, :]
                sel[c] = jnp.where(pick, cand, sel[c])
        dc, sc, z2c, t2dc = sel
        # negation in cached form: swap (d, s), negate t2d
        negb = neg[None, :]
        dc, sc = (jnp.where(negb, sc, dc), jnp.where(negb, dc, sc))
        t2dc = jnp.where(negb, _wred(b - t2dc, 2), t2dc)
        return _padd_cached_body(b, *acc, dc, sc, z2c, t2dc)

    def win_body(wi, acc):
        acc = _dbl(b, *acc)
        acc = _dbl(b, *acc)
        acc = _dbl(b, *acc)
        acc = _dbl(b, *acc)
        return jax.lax.fori_loop(0, k_terms,
                                 lambda k, a: term_body(wi, k, a), acc)

    acc = jax.lax.fori_loop(0, 64, win_body, acc)
    ox[:], oy[:], oz[:], ot[:] = acc


# ---------------------------------------------------------------------------
# per-slab materialization (one jit per (n_t, d, o_n, half) shape)

@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def _mat_slab(src, coeff, o_lo, n_t: int, d: int, o_n: int, half_off: int,
              m_old: int):
    """One output-lane slab of the fold: outputs O_i (i in [o_lo, o_lo+o_n))
    of  O_i = sum_k coeff[i + k*n'] * P[half_off + i + k*n'].

    src: old affine rows [2*m_old+1, 64] int16; coeff: [n_t, NW] mont.
    Returns (rows [o_n, 64] int16, neg_rows [o_n, 64] int16)."""
    k_terms = 1 << d
    n_out = n_t >> d
    bias = jnp.asarray(_SUB_BIAS_COL)
    d2 = jnp.asarray(_D2_COL)

    # gather base rows + coefficients for all K terms, K stacked into lanes
    rows_k = []
    coef_k = []
    for k in range(k_terms):
        start = half_off + k * n_out + o_lo
        rows_k.append(jax.lax.dynamic_slice(src, (start, 0), (o_n, 64)))
        coef_k.append(jax.lax.dynamic_slice(
            coeff, (k * n_out + o_lo, 0), (o_n, NW)))
    big = jnp.concatenate(rows_k, axis=0).astype(jnp.int32).T  # [64, K*o_n]
    x = big[0:NL]
    y = big[NL:2 * NL]
    # extended base: Z = 1, T = x*y
    one_col = jnp.zeros((NL, k_terms * o_n), jnp.int32).at[0, :].set(1)
    t = _fpmul(x, y)
    m1 = (x, y, one_col, t)

    # multiples 1P..8P (extended), then cached Niels form
    m2 = _dbl(bias, *m1)
    m3 = _padd(bias, d2, *m2, *m1)
    m4 = _dbl(bias, *m2)
    m5 = _padd(bias, d2, *m4, *m1)
    m6 = _dbl(bias, *m3)
    m7 = _padd(bias, d2, *m6, *m1)
    m8 = _dbl(bias, *m4)
    cached = []
    for (mx, my, mz, mt) in (m1, m2, m3, m4, m5, m6, m7, m8):
        dc = _lazy(my + bias - mx)
        sc = _lazy(my + mx)
        z2c = _lazy(mz + mz)
        t2dc = _fpmul(mt, d2)
        cached.append(jnp.stack([dc, sc, z2c, t2dc]))   # [4, NL, K*o_n]
    # [8, 4, NL, K, o_n] -> [K, 8*4*NL, o_n]
    mult = jnp.stack(cached).reshape(8, 4, NL, k_terms, o_n)
    mult = mult.transpose(3, 0, 1, 2, 4).reshape(k_terms, 8 * 4 * NL, o_n)

    # digits: mont -> std -> 64 signed 4-bit windows, row w*K + k
    coefs = jnp.concatenate(coef_k, axis=0)             # [K*o_n, NW]
    std = mont_mul(coefs, jnp.broadcast_to(jnp.asarray(_ONE_FL), coefs.shape))
    dig = digits4_dev(std).reshape(64 * k_terms, o_n)

    blk = o_n if o_n < 512 else 512
    assert o_n % blk == 0
    nb = o_n // blk
    ospec = pl.BlockSpec((NL, blk), lambda j: (0, j),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((NL, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((k_terms, 8 * 4 * NL, blk), lambda j: (0, 0, j),
                         memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((64 * k_terms, blk), lambda j: (0, j),
                         memory_space=pltpu.VMEM)
    params = (None if _use_interpret() else
              pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024))
    ox, oy, oz, ot = pl.pallas_call(
        partial(_ladder_kernel, k_terms=k_terms),
        grid=(nb,),
        in_specs=[cspec, dspec, mspec],
        out_specs=[ospec] * 4,
        out_shape=[jax.ShapeDtypeStruct((NL, o_n), jnp.int32)] * 4,
        compiler_params=params,
        interpret=_use_interpret(),
    )(bias, dig, mult)

    # back to affine rows: x = X/Z, y = Y/Z, t2d = x*y*2d
    zinv = inv_fp_cols(oz)
    ax = _fpmul(ox, zinv)
    ay = _fpmul(oy, zinv)
    at2d = _fpmul(_fpmul(ax, ay), d2)
    pad = jnp.zeros((o_n, 4), jnp.int32)
    rows = jnp.concatenate([ax.T, ay.T, at2d.T, pad], axis=1)
    nx = _wred(bias - ax, 2)
    nt = _wred(bias - at2d, 2)
    neg_rows = jnp.concatenate([nx.T, ay.T, nt.T, pad], axis=1)
    return rows.astype(jnp.int16), neg_rows.astype(jnp.int16)


@partial(jax.jit, static_argnums=(2, 3))
def _assemble(parts, old_src, n_out: int, m_old: int):
    """parts: (G_rows, G_negs, H_rows, H_negs) lists already concatenated
    to [n_out, 64] each.  Returns the new [2*(2*n_out+2)+1, 64] source."""
    g_rows, g_negs, h_rows, h_negs = parts
    n_t_old = (m_old - 2) // 2
    b_rows = jax.lax.dynamic_slice(old_src, (2 * n_t_old, 0), (2, 64))
    b_negs = jax.lax.dynamic_slice(old_src, (m_old + 2 * n_t_old, 0), (2, 64))
    ident = old_src[2 * m_old:2 * m_old + 1]
    return jnp.concatenate([g_rows, h_rows, b_rows,
                            g_negs, h_negs, b_negs, ident], axis=0)


def materialize(src, gc, hc, n_t: int, d: int, m_old: int):
    """Fold the device table down 2^d-fold using the collapsed coefficients
    (AFTER the pending challenge fold has been applied to gc/hc).

    src: [2*m_old+1, 64] int16 rows ([G | H | B | Bb | negs | id]);
    gc/hc: [n_t, NW] mont coefficient vectors.
    Returns new_src for the table [G' | H' | B | Bb | negs | id] with
    n' = n_t / 2^d."""
    k_terms = 1 << d
    n_out = n_t >> d
    # slab so the multiples transient stays bounded (~<= 2^17 build lanes)
    o_n = min(n_out, max(512, (1 << 17) // k_terms))
    halves = []
    for half_off, coeff in ((0, gc), (n_t, hc)):
        rows_l, negs_l = [], []
        lo = 0
        while lo < n_out:
            h = min(o_n, n_out - lo)
            r, ng = _mat_slab(src, coeff, lo, n_t, d, h, half_off, m_old)
            rows_l.append(r)
            negs_l.append(ng)
            lo += h
        halves.append((jnp.concatenate(rows_l, axis=0) if len(rows_l) > 1
                       else rows_l[0],
                       jnp.concatenate(negs_l, axis=0) if len(negs_l) > 1
                       else negs_l[0]))
    (g_rows, g_negs), (h_rows, h_negs) = halves
    return _assemble((g_rows, g_negs, h_rows, h_negs), src, n_out, m_old)
