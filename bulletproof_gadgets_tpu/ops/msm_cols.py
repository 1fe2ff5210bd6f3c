"""Pippenger MSM in limbs-leading ("cols") layout with Pallas-fused point
addition — the fast path.

Differences from ops/msm.py (the reference jnp path, kept as oracle):
  * points live as [NL, n] int32 (lanes = points, sublanes = limbs);
  * ALL windows are processed in one flat [NL, W*n] array — every Hillis-
    Steele scan step is ONE fused padd over the whole working set, with
    window boundaries enforced by lane masks ((lane mod n) >= shift);
  * the group-law body is the Pallas kernel ops/pallas_curve.padd_cols
    (VMEM-resident, ~60 full-width VPU ops) instead of dozens of unfused
    HBM round trips.

Sequence per MSM: gather-by-sorted-digit -> log2(n) scan steps -> bucket
sums by prefix difference -> 2 * log2(B) weighted scan steps -> [W] window
sums -> host Horner.  ~(log2(n) + 15) fused padd calls total.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import fp, curve
from .pallas_curve import padd_cols, to_cols, from_cols
from .msm import signed_digits, choose_c, horner_combine
from ..core.scalar import L
from ..core.ristretto import RistrettoPoint

NL = fp.NL

# identity point columns: X=0, Y=1, Z=1, T=0
_ID_X = np.zeros((NL, 1), dtype=np.int32)
_ID_Y = np.zeros((NL, 1), dtype=np.int32)
_ID_Y[0, 0] = 1


def _select(mask_lanes, a, b_cols):
    """where(mask) ? a : b — mask [m] over lanes; b_cols given per
    coordinate as [NL, 1] numpy (broadcast)."""
    m = mask_lanes[None, :]
    return tuple(jnp.where(m, x, jnp.asarray(bc))
                 for x, bc in zip(a, b_cols))


_IDENT_COLS = (_ID_X, _ID_Y, _ID_Y, _ID_X)


def _scan(x, seg: int):
    """Segmented scan: masked Hillis-Steele with the fused padd kernel.
    (The experimental blocked Pallas scan and its BPG_TPU_BLOCKED_SCAN
    gate were removed once the serial-bucket path superseded this module
    as the default backend — ops/msm_serial.py does O(n) additions, no
    length-n scans.)"""
    return _masked_scan(x, seg, max(1, (seg - 1).bit_length()))


def _masked_scan(x, seg: int, log_steps: int):
    """Inclusive prefix scan within segments of length `seg` along lanes.
    x: pytree [NL, m] with m % seg == 0."""
    m = x[0].shape[1]
    lane = jnp.arange(m, dtype=jnp.int32) % seg

    def body(s, acc):
        shift = jnp.int32(1) << s
        shifted = tuple(jnp.roll(leaf, shift, axis=1) for leaf in acc)
        addend = _select(lane >= shift, shifted, _IDENT_COLS)
        return padd_cols(acc, addend)

    return jax.lax.fori_loop(0, log_steps, body, x)


def _pneg_cols(p):
    """Negate: X' = -X, T' = -T via 96p bias (values stay nearly
    normalized)."""
    x, y, z, t = p
    bias = jnp.asarray(fp._SUB_BIAS.reshape(NL, 1))

    def neg(v):
        c = bias - v
        # one redistribute pass + fold (mirrors fp.sub_lazy, cols layout)
        w = c.shape[0]
        for _ in range(2):
            lo = c & fp.MASK
            hi = c >> fp.B
            hi_up = jnp.concatenate(
                [jnp.zeros((1, c.shape[1]), c.dtype), hi], axis=0)
            c = jnp.concatenate(
                [lo, jnp.zeros((1, c.shape[1]), c.dtype)], axis=0) + hi_up
        lo2 = c[:NL]
        hi2 = c[NL:]
        pad = jnp.zeros((NL - hi2.shape[0], c.shape[1]), c.dtype)
        return lo2 + jnp.concatenate([hi2, pad], axis=0) * fp.FOLD

    return (neg(x), y, z, neg(t))


@partial(jax.jit, static_argnums=(2,))
def _window_sums_cols(digits, points_cols, c: int):
    """digits [n, W] int32; points_cols pytree [NL, n].
    Returns pytree [W, NL] of window sums (rows layout for horner)."""
    n, W = digits.shape
    num_buckets = 1 << (c - 1)          # bucket ids 1..B

    keys = jnp.abs(digits)                       # [n, W]
    order = jnp.argsort(keys, axis=0)            # [n, W]
    keys_s = jnp.take_along_axis(keys, order, axis=0)
    digits_s = jnp.take_along_axis(digits, order, axis=0)

    flat_idx = order.T.reshape(W * n)            # lane -> source point
    sign_neg = (digits_s < 0).T.reshape(W * n)
    is_zero = (keys_s == 0).T.reshape(W * n)

    neg_pts = _pneg_cols(points_cols)
    gathered = tuple(x[:, flat_idx] for x in points_cols)
    gathered_neg = tuple(x[:, flat_idx] for x in neg_pts)
    pts = tuple(jnp.where(sign_neg[None, :], gn, g)
                for g, gn in zip(gathered, gathered_neg))
    pts = _select(~is_zero, pts, _IDENT_COLS)

    prefix = _scan(pts, n)                       # [NL, W*n]

    # bucket boundaries: counts[w, b] = #keys <= b in window w
    bvals = jnp.arange(num_buckets + 1, dtype=keys_s.dtype)  # 0..B
    counts = jax.vmap(
        lambda col: jnp.searchsorted(col, bvals, side="right"),
        in_axes=1)(keys_s)                       # [W, B+1]
    base = (jnp.arange(W, dtype=jnp.int32) * n)[:, None]
    pos = (base + counts - 1).reshape(W * (num_buckets + 1))
    empty = (counts == 0).reshape(W * (num_buckets + 1))
    ends = tuple(x[:, jnp.maximum(pos, 0)] for x in prefix)
    ends = _select(~empty, ends, _IDENT_COLS)    # prefix at boundary or id

    e = tuple(x.reshape(NL, W, num_buckets + 1) for x in ends)
    starts = tuple(x[:, :, :-1].reshape(NL, W * num_buckets) for x in e)
    stops = tuple(x[:, :, 1:].reshape(NL, W * num_buckets) for x in e)
    buckets = padd_cols(stops, _pneg_cols(starts))   # S_1..S_B per window

    # weighted sum: reverse within window, suffix scan, then total scan
    rev = tuple(x.reshape(NL, W, num_buckets)[:, :, ::-1]
                .reshape(NL, W * num_buckets) for x in buckets)
    suffix = _scan(rev, num_buckets)
    total = _scan(suffix, num_buckets)
    lastpos = (jnp.arange(W, dtype=jnp.int32) * num_buckets
               + (num_buckets - 1))
    wsums = tuple(x[:, lastpos] for x in total)      # [NL, W]
    return tuple(jnp.swapaxes(x, 0, 1) for x in wsums)   # [W, NL]


def window_sums(digits: np.ndarray, points_cols, c: int):
    return _window_sums_cols(jnp.asarray(digits), points_cols, c)


_cols_cache = {}          # id(points list) -> (points list ref, cols pytree)
_COLS_CACHE_MAX = 4


def _points_cols_cached(points):
    """Device cols arrays for a host point list, cached by list identity
    (the IPA reuses one stable G+H+[Q] list across all rounds)."""
    key = id(points)
    hit = _cols_cache.get(key)
    if hit is not None and hit[0] is points and len(points) == hit[2]:
        return hit[1]
    cols = to_cols(curve.points_to_device(points))
    if len(_cols_cache) >= _COLS_CACHE_MAX:
        _cols_cache.pop(next(iter(_cols_cache)))
    _cols_cache[key] = (points, cols, len(points))
    return cols


def msm(scalars, points) -> RistrettoPoint:
    """Host entry: scalars list[int], points list[RistrettoPoint]."""
    ks = [k % L for k in scalars]
    c = choose_c(len(ks))
    digits = signed_digits(ks, c)
    pts_cols = _points_cols_cached(points)
    wsums = window_sums(digits, pts_cols, c)
    return horner_combine(wsums, c)


class GeneratorTable:
    """Device-resident prover MSM table: [G_0..G_{N-1} | H_0..H_{N-1} | B |
    B_blinding] in cols layout, uploaded to HBM once per proof size.

    This is the TPU-first answer to dalek keeping generator slices on the
    CPU heap (SURVEY.md §2.B "device-resident G/H arrays"): every prover
    MSM — the A_I/A_O/S vector commitments and each IPA round's L/R — is a
    scalar vector over this ONE fixed point set, so (a) points never
    re-upload, (b) several MSMs batch into a single window_sums launch by
    stacking their digit windows along the window axis, and (c) the jit
    cache sees exactly one digits shape per (proof size, batch width).
    """

    __slots__ = ("N", "m", "mp", "c", "cols")

    def __init__(self, G, H, B, B_blinding):
        self.N = len(G)
        assert len(H) == self.N
        self.m = 2 * self.N + 2
        # pad lanes to a 512-multiple with identity points (zero digits)
        # so full-table-width segments stay Pallas-block aligned
        self.mp = -(-self.m // 512) * 512
        pad = [RistrettoPoint.identity()] * (self.mp - self.m)
        self.c = choose_c(self.mp)
        self.cols = to_cols(curve.points_to_device(
            list(G) + list(H) + [B, B_blinding] + pad))

    def msm_many(self, vectors):
        """vectors: list of length-m scalar vectors (ints, any residue).
        Returns list[RistrettoPoint], one per vector — ONE device launch."""
        W = 32 * 8 // self.c          # windows per vector (c | 8)
        zpad = [0] * (self.mp - self.m)
        digit_blocks = [signed_digits([k % L for k in v] + zpad, self.c)
                        for v in vectors]
        digits = np.concatenate(digit_blocks, axis=1)      # [mp, k*W]
        ws = window_sums(digits, self.cols, self.c)        # [k*W, NL] rows
        pts = curve.points_from_device(ws)
        out = []
        for g in range(len(vectors)):
            acc = RistrettoPoint.identity()
            for wp in reversed(pts[g * W:(g + 1) * W]):
                for _ in range(self.c):
                    acc = acc.double()
                acc = acc + wp
            out.append(acc)
        return out
