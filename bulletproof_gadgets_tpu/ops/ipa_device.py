"""Device-resident inner-product-argument rounds.

dalek's prover (inner_product_proof.rs, behind the reference's `yoloproofs`
feature) folds a/b/G/H on the CPU every round.  Here the four coefficient
vectors (a, b std form; gc, hc Montgomery form — the collapsed-fold
coefficients of the ORIGINAL generators inside the current virtual ones)
live on the TPU for the whole argument:

  per round, ONE fused jit computes the previous round's fold (skipped on
  the first round), the c_L/c_R cross inner products, the full-table MSM
  scalar vectors for L and R, and their signed digits — the only readback
  is the [2*32, m] int8 digit matrix, which feeds the serial-bucket MSM
  schedule directly (no host bigints anywhere in the loop).

Round structure (positions relative to the current virtual length n):
  pos = t mod n;  cross index ga[t] = pos-half if pos >= half else pos+half
  L: G_t gets a[pos-half]*gc[t] when pos >= half, H_t gets b[pos+half]*hc[t]
     when pos < half, Q gets c_L*w;  R mirrors with the halves swapped.
The emitted L/R points, challenges, and final a/b are bit-identical to
dalek's (oracle: the host path in core/ipa.py; tests/test_ipa_device.py).
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import flvec
from .fl import mont_mul, NW, R as _R
from ..core.scalar import L


def _masks(n_full: int):
    """Static per-round gather/select arrays, cached per n_full.

    Returns list over rounds (n = n_full, n_full/2, ..., 2) of dicts:
      ga   [n_full] int32 — cross-half gather index (see module doc)
      hi   [n_full] int32 — 1 when pos >= half
      cs   [n_full] int32 — shift-by-half gather for the c_L/c_R products
      lo_i [n_full] int32 — 1 when i < half (c_L sum mask over rows)
      tL/tH [n_full/2] int32 — positions with hi = 1 / hi = 0 (each
            exactly half: the L vector's G-activity and the R vector's,
            complements) — the compact-layout gathers
      remap [2, 2*(n_full/2*2+1)+1] int32 — compact column -> source-table
            row map for msm_serial._msm_serial_static_remapped (row 0 = L,
            row 1 = R; second half = negated rows; last = identity)
    """
    out = []
    t = np.arange(n_full, dtype=np.int32)
    i = np.arange(n_full, dtype=np.int32)
    m_pts = 2 * n_full + 2
    n = n_full
    while n != 1:
        half = n // 2
        pos = t % n
        hi = (pos >= half).astype(np.int32)
        ga = np.where(hi, pos - half, pos + half).astype(np.int32)
        lo_i = (i < half).astype(np.int32)       # c_L rows
        hi_i = ((i >= half) & (i < n)).astype(np.int32)  # c_R rows
        cs = np.where(i < half, i + half,
                      np.maximum(i - half, 0)).astype(np.int32)
        tL = np.nonzero(hi)[0].astype(np.int32)
        tH = np.nonzero(1 - hi)[0].astype(np.int32)
        assert tL.size == tH.size == n_full // 2
        # L columns: G_t for t in tL, H_t (table row n_full + t) for t in
        # tH, then B (row 2*n_full); R mirrors with tL/tH swapped
        colsL = np.concatenate([tL, n_full + tH, [2 * n_full]])
        colsR = np.concatenate([tH, n_full + tL, [2 * n_full]])
        nc = colsL.size                          # n_full + 1
        remap = np.stack([
            np.concatenate([colsL, m_pts + colsL, [2 * m_pts]]),
            np.concatenate([colsR, m_pts + colsR, [2 * m_pts]]),
        ]).astype(np.int32)
        out.append(dict(ga=jnp.asarray(ga), hi=jnp.asarray(hi),
                        cs=jnp.asarray(cs), lo_i=jnp.asarray(lo_i),
                        hi_i=jnp.asarray(hi_i),
                        tL=jnp.asarray(tL), tH=jnp.asarray(tH),
                        remap=jnp.asarray(remap)))
        n = half
    return out


_mask_cache = {}


def round_masks(n_full: int):
    m = _mask_cache.get(n_full)
    if m is None:
        m = _masks(n_full)
        _mask_cache[n_full] = m
    return m


@jax.jit
def _fold(a, b, gc, hc, u_m, uinv_m, ga, hi):
    """One dalek fold: a' = a_lo*u + a_hi*u_inv (first half meaningful),
    gc' = gc * (u if hi else u_inv), hc' mirrored.  Full-length arrays so
    every round reuses this one compiled graph."""
    a_x = jnp.take(a, ga, axis=0)
    b_x = jnp.take(b, ga, axis=0)
    sel = hi[:, None]
    # rows < half have hi=0: a' = a*u + a_x*u_inv; garbage above half is
    # never read (masks zero it in the scalar stage)
    a2 = flvec.add(mont_mul(a, u_m), mont_mul(a_x, uinv_m))
    b2 = flvec.add(mont_mul(b, uinv_m), mont_mul(b_x, u_m))
    gc2 = jnp.where(sel == 1, mont_mul(gc, u_m), mont_mul(gc, uinv_m))
    hc2 = jnp.where(sel == 1, mont_mul(hc, uinv_m), mont_mul(hc, u_m))
    return a2, b2, gc2, hc2


def _scalar_rows(a, b, gc, hc, wr2, ga, hi, cs, lo_i, hi_i):
    """[2m, NW] std limb rows: the L vector stacked over the R vector."""
    n_full = a.shape[0]
    sel = hi[:, None]
    prod_a = mont_mul(jnp.take(a, ga, axis=0), gc)      # a[cross]*gc, std
    prod_b = mont_mul(jnp.take(b, ga, axis=0), hc)

    b_x = jnp.take(b, cs, axis=0)
    p1 = mont_mul(a, b_x)                               # a_i * b_shift / R
    s_lo = flvec.sum_rows(jnp.where(lo_i[:, None] == 1, p1, 0))  # c_L / R
    s_hi = flvec.sum_rows(jnp.where(hi_i[:, None] == 1, p1, 0))  # c_R / R
    cLw = mont_mul(s_lo, wr2)                           # * w*R^2 / R = c_L*w
    cRw = mont_mul(s_hi, wr2)

    zero = jnp.zeros((1, NW), jnp.int32)
    vL = jnp.concatenate([jnp.where(sel == 1, prod_a, 0),
                          jnp.where(sel == 1, 0, prod_b),
                          cLw[None, :], zero], axis=0)
    vR = jnp.concatenate([jnp.where(sel == 1, 0, prod_a),
                          jnp.where(sel == 1, prod_b, 0),
                          cRw[None, :], zero], axis=0)
    return jnp.concatenate([vL, vR], axis=0)            # [2m, NW]


@jax.jit
def _scalars(a, b, gc, hc, wr2, ga, hi, cs, lo_i, hi_i):
    """MSM scalar vectors for this round's L and R as signed c=8 digits.
    Returns [2*32, m] int8 (window-major; m = 2*n_full + 2)."""
    both = _scalar_rows(a, b, gc, hc, wr2, ga, hi, cs, lo_i, hi_i)
    n_full = a.shape[0]
    dig = flvec.digits_device(both)                     # [32, 2m] int8
    m = n_full * 2 + 2
    return jnp.concatenate([dig[:, :m], dig[:, m:]], axis=0)  # [64, m]


@jax.jit
def _scalars13(a, b, gc, hc, wr2, ga, hi, cs, lo_i, hi_i):
    """c=13 variant: [2*20, m] int16 signed limb-width digits."""
    both = _scalar_rows(a, b, gc, hc, wr2, ga, hi, cs, lo_i, hi_i)
    n_full = a.shape[0]
    dig = flvec.digits13_device(both)                   # [20, 2m] int16
    m = n_full * 2 + 2
    return jnp.concatenate([dig[:, :m], dig[:, m:]], axis=0)  # [40, m]


@jax.jit
def _scalars_compact(a, b, gc, hc, wr2, ga, hi, cs, lo_i, hi_i, tL, tH):
    """Compact-layout MSM digits: [2*32, n_full + 1] int8.

    The full L/R vectors are half structural zeros (each table point lands
    in exactly one of L, R per round), which the entry sort and digit
    recode still paid for.  Column j of the compact L vector is the scalar
    of source row remap[0, j] (mask `remap`), built by gathering the SAME
    prod_a/prod_b products the dense layout computes:
      L = [prod_a[tL] | prod_b[tH] | c_L*w],  R = [prod_a[tH] | prod_b[tL]
      | c_R*w]."""
    sel = hi[:, None]
    prod_a = mont_mul(jnp.take(a, ga, axis=0), gc)
    prod_b = mont_mul(jnp.take(b, ga, axis=0), hc)

    b_x = jnp.take(b, cs, axis=0)
    p1 = mont_mul(a, b_x)
    s_lo = flvec.sum_rows(jnp.where(lo_i[:, None] == 1, p1, 0))
    s_hi = flvec.sum_rows(jnp.where(hi_i[:, None] == 1, p1, 0))
    cLw = mont_mul(s_lo, wr2)
    cRw = mont_mul(s_hi, wr2)

    vL = jnp.concatenate([jnp.take(prod_a, tL, axis=0),
                          jnp.take(prod_b, tH, axis=0),
                          cLw[None, :]], axis=0)        # [n_full+1, NW]
    vR = jnp.concatenate([jnp.take(prod_a, tH, axis=0),
                          jnp.take(prod_b, tL, axis=0),
                          cRw[None, :]], axis=0)
    both = jnp.concatenate([vL, vR], axis=0)            # [2(n+1), NW]
    dig = flvec.digits_device(both)                     # [32, 2(n+1)]
    nc = vL.shape[0]
    return jnp.concatenate([dig[:, :nc], dig[:, nc:]], axis=0)  # [64, nc]


def create(transcript, table, w_scalar, G_factors, H_factors, a, b,
           append_point, challenge_scalar):
    """Drives create_gen against the table directly (single proof)."""
    gen = create_gen(transcript, table, w_scalar, G_factors, H_factors,
                     a, b, append_point, challenge_scalar)
    resp = None
    while True:
        try:
            kind, tbl, dig = gen.send(resp)
        except StopIteration as stop:
            return stop.value
        resp = (tbl.msm_digits(dig) if kind == "msm"
                else np.asarray(dig))


def create_gen(transcript, table, w_scalar, G_factors, H_factors, a, b,
               append_point, challenge_scalar):
    """Runs the full IPA with device state, yielding ("msm", table, digits)
    per round (lang.batch combines rounds across proofs).  table:
    msm_serial GeneratorTable sized to n_full; returns (L_vec, R_vec, a0,
    b0) with a0/b0 canonical ints."""
    from . import msm_serial

    if isinstance(a, list):
        a = jnp.asarray(flvec.to_limbs([s % L for s in a]))
    if isinstance(b, list):
        b = jnp.asarray(flvec.to_limbs([s % L for s in b]))
    a_d, b_d = a, b
    n_full = a_d.shape[0]
    assert table.N == n_full
    masks = round_masks(n_full)

    gc_d = jnp.asarray(flvec.to_mont([s % L for s in G_factors]))
    hc_d = jnp.asarray(flvec.to_mont([s % L for s in H_factors]))
    wr2 = jnp.asarray(flvec.to_limbs([w_scalar * _R * _R % L]))[0]

    L_vec, R_vec = [], []
    u_prev = None
    for rnd, mk in enumerate(masks):
        if u_prev is not None:
            prev = masks[rnd - 1]
            a_d, b_d, gc_d, hc_d = _fold(
                a_d, b_d, gc_d, hc_d, u_prev[0], u_prev[1],
                prev["ga"], prev["hi"])
        dig = _scalars(a_d, b_d, gc_d, hc_d, wr2,
                       mk["ga"], mk["hi"], mk["cs"], mk["lo_i"],
                       mk["hi_i"])
        pL, pR = yield ("msm", table, dig)
        Lb = pL.compress()
        Rb = pR.compress()
        append_point(transcript, b"L", Lb)
        append_point(transcript, b"R", Rb)
        L_vec.append(Lb)
        R_vec.append(Rb)
        u = challenge_scalar(transcript, b"u").v % L
        u_inv = pow(u, L - 2, L)
        u_prev = (jnp.asarray(flvec.to_mont([u])),
                  jnp.asarray(flvec.to_mont([u_inv])))

    if u_prev is not None:
        prev = masks[-1]
        a_d, b_d, gc_d, hc_d = _fold(a_d, b_d, gc_d, hc_d,
                                     u_prev[0], u_prev[1],
                                     prev["ga"], prev["hi"])
    fin = yield ("fetch", None, jnp.stack([a_d[0], b_d[0]]))
    a0, b0 = flvec.limbs_to_ints(fin)
    return L_vec, R_vec, a0, b0
