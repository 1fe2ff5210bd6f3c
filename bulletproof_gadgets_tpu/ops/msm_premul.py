"""Premultiplied-window serial-bucket MSM (c=16) for LARGE point sets.

For a fixed table the 16 window multiples P_i * 2^(16w) can be precomputed,
collapsing Pippenger to ONE shared bucket space of 2^15 buckets:

  * half the group additions of the c=8 path (16n entries vs 32n),
  * no Horner doubling cascade — the weighted bucket sum IS the result,
  * the weighted reduction over 2^15 buckets decomposes hierarchically
    (b = 256*hi + lo) into two tree-sums plus two short masked scans,
    ~70k lane-padds instead of the 2 * 15 full-width suffix scans a flat
    reduction would need.

Costs: the table is 32x the base points (affine rows, int16-packed:
~128 B * 32 * n — 0.5 GB at n = 2^17), built host-side once per point set
and disk-cached.  Scheduling slack is higher than c=8 (bucket occupancy
mean is n/2048, so T = mean + 3*sqrt(mean) over-provisions by ~1.5x at
n = 2^16), which is why this path only wins for n >= ~2^15.

Role: same as ops/msm_serial (dalek Pippenger/AVX2,
/root/reference/src/prove.rs:79, src/verify.rs:71), specialized for the
verifier mega-MSM of large circuits and the headline benchmark.
"""
import os
import hashlib
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import fp
from .msm import signed_digits
from .msm_cols import _masked_scan
from .msm_serial import (_bucket_kernel, _seg_scan, _schedule_arrays,
                         _plan, Schedule, _points_from_cols, _r_chunk, _BLK)
from .pallas_curve import padd_cols, _SUB_BIAS_COL, _use_interpret
from ..core.scalar import L
from ..core.ristretto import (RistrettoPoint, batch_normalize, P as _P,
                              D as _D)

NL = fp.NL
C16 = 16
NB16 = 1 << 15            # shared bucket space (|digit| in [1, 2^15])
W16 = 16                  # windows per 256-bit scalar
_2D = 2 * _D % _P

_CACHE_DIR = os.environ.get(
    "BPG_TPU_CACHE", os.path.join(os.path.expanduser("~"), ".cache",
                                  "bpg_tpu"))


# ---------------------------------------------------------------------------
# table construction (host, disk-cached)

def _premul_rows(points) -> np.ndarray:
    """[32m+1, 64] int16 packed affine rows:
    [w0 P | w0 -P | w1 P | ... | identity] is NOT the layout — rows are
    [all 16 windows of P | all 16 windows of -P | identity] so negation is
    row + 16m, mirroring msm_serial.prep_source."""
    m = len(points)
    ext = []
    cur = list(points)
    for w in range(W16):
        ext.extend(cur)
        if w < W16 - 1:
            nxt = []
            for pt in cur:
                for _ in range(C16):
                    pt = pt.double()
                nxt.append(pt)
            cur = nxt
    aff = batch_normalize(ext)                       # [16m]
    xs = [pt.X for pt in aff]
    ys = [pt.Y for pt in aff]
    t2ds = [pt.T * _2D % _P for pt in aff]
    rows = np.zeros((2 * W16 * m + 1, 64), dtype=np.int16)
    rows[:, 0:20] = fp.ints_to_limbs_cols(
        xs + [(_P - x) % _P for x in xs] + [0]).T
    rows[:, 20:40] = fp.ints_to_limbs_cols(ys + ys + [1]).T
    rows[:, 40:60] = fp.ints_to_limbs_cols(
        t2ds + [(_P - t) % _P for t in t2ds] + [0]).T
    return rows


def _cache_path(points) -> str:
    h = hashlib.sha256()
    h.update(len(points).to_bytes(8, "little"))
    for pt in (points[0], points[len(points) // 2], points[-1]):
        h.update(pt.compress())
    d = os.path.join(_CACHE_DIR, "premul")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, h.hexdigest()[:24] + ".npy")


def premul_source(points):
    """(device [32m+1, 64] int16 rows, m) with a disk cache keyed on the
    point set (endpoint compressions — tables are deterministic chains)."""
    path = _cache_path(points)
    if os.path.exists(path):
        rows = np.load(path)
    else:
        rows = _premul_rows(points)
        tmp = path + ".tmp.npy"
        np.save(tmp, rows)
        os.replace(tmp, path)
    return jnp.asarray(rows), len(points)


# ---------------------------------------------------------------------------
# scheduling (numpy; entries are [n, 16k] c=16 signed digits)

def build_schedule16(digits: np.ndarray, n: int) -> "Schedule":
    """digits [n, 16k] int32 signed c=16 digits (vector v owns columns
    16v..16v+15).  Bucket lane = vec*NB16 + |d|-1; source row =
    w*n + i + 16n*(d<0)."""
    wt = digits.shape[1]
    k = wt // W16
    m_b = k * NB16
    a = np.abs(digits)
    vec = (np.arange(wt, dtype=np.int64) // W16)[None, :]
    win = (np.arange(wt, dtype=np.int64) % W16)[None, :]
    lanes = vec * NB16 + a - 1
    valid = a > 0
    i_col = np.arange(n, dtype=np.int64)[:, None]
    src = win * n + i_col + np.where(digits < 0, W16 * n, 0)
    lf = lanes.T.ravel()[valid.T.ravel()]
    sf = src.T.ravel()[valid.T.ravel()]
    counts = np.bincount(lf, minlength=m_b).astype(np.int64)
    t, sub, offs, pool, p_pad = _plan(counts, int(lf.size))
    order = np.argsort(lf, kind="stable")
    ls = lf[order]
    coffs = np.zeros(m_b + 1, dtype=np.int64)
    np.cumsum(counts, out=coffs[1:])
    rank = np.arange(lf.size, dtype=np.int64) - coffs[ls]
    idx = np.full((t, p_pad), 2 * W16 * n, dtype=np.int32)
    idx[rank % t, offs[ls] + rank // t] = sf[order].astype(np.int32)
    segid, last_pos, steps = _schedule_arrays(sub, offs, pool, p_pad, m_b)
    return Schedule(idx, segid, last_pos, steps, k)


# ---------------------------------------------------------------------------
# device pipeline: bucket stage (shared kernel) + hierarchical reduction

@partial(jax.jit, static_argnums=(4, 5))
def _msm_premul_device(idx, segid, last_pos, src, k: int, merge_steps: int):
    t_rounds, p = idx.shape
    m_b = last_pos.shape[0]                          # k * NB16
    flat = idx.reshape(-1)
    g64 = jnp.take(src, flat, axis=0)                # [T*P, 64] int16

    bias = jnp.asarray(_SUB_BIAS_COL)
    blk = min(p, _BLK)
    nb = p // blk
    rc = _r_chunk(t_rounds)
    if rc == 1:
        rc = 8 if t_rounds % 8 == 0 else 1
    g3 = (g64.astype(jnp.int32)                      # int16 transpose is slow
          .reshape(t_rounds, p, 64).transpose(0, 2, 1))
    g = (g3[:, 0:NL], g3[:, NL:2 * NL], g3[:, 2 * NL:3 * NL])
    spec = pl.BlockSpec((rc, NL, blk), lambda j, r: (r, 0, j),
                        memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((NL, blk), lambda j, r: (0, j),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((NL, 1), lambda j, r: (0, 0),
                         memory_space=pltpu.VMEM)
    params = (None if _use_interpret() else
              pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024))
    pool = pl.pallas_call(
        partial(_bucket_kernel, r_chunk=rc),
        grid=(nb, t_rounds // rc),
        in_specs=[cspec] + [spec] * 3,
        out_specs=[ospec] * 4,
        out_shape=[jax.ShapeDtypeStruct((NL, p), jnp.int32)] * 4,
        compiler_params=params,
        interpret=_use_interpret(),
    )(bias, *g)

    merged = _seg_scan(tuple(pool), segid, merge_steps)
    buckets = tuple(x[:, last_pos] for x in merged)  # [NL, k*NB16]

    # hierarchical weighted sum: bucket b holds digit value b+1,
    # b = 256*hi + lo  ->  sum (b+1) S_b = sum (lo+1) A[lo]
    #                                      + 256 * sum hi B[hi]
    HI, LO = 128, 256

    def tree_sum(x4, axis_len, stride):
        # sum groups of `axis_len` consecutive blocks of width `stride`
        cur = x4
        h = axis_len
        while h > 1:
            half = h // 2
            cur_r = tuple(x.reshape(NL, k, h, stride) for x in cur)
            lo_ = tuple(x[:, :, :half].reshape(NL, k * half * stride)
                        for x in cur_r)
            hi_ = tuple(x[:, :, half:].reshape(NL, k * half * stride)
                        for x in cur_r)
            cur = padd_cols(lo_, hi_)
            h = half
        return tuple(x.reshape(NL, k * stride) for x in cur)

    # A[lo] = sum_hi S[hi, lo]: tree over the hi axis (stride LO)
    a_lo = tree_sum(buckets, HI, LO)                 # [NL, k*LO]
    # B[hi] = sum_lo S[hi, lo]: transpose lo inside each hi block first
    bt = tuple(x.reshape(NL, k, HI, LO).transpose(0, 1, 3, 2)
               .reshape(NL, k * LO * HI) for x in buckets)
    b_hi = tree_sum(bt, LO, HI)                      # [NL, k*HI]

    def weighted(x4, nb_, steps):
        # sum (i+1) X_i per k-block via double suffix scan
        rev = tuple(x.reshape(NL, k, nb_)[:, :, ::-1].reshape(NL, k * nb_)
                    for x in x4)
        suffix = _masked_scan(rev, nb_, steps)
        total = _masked_scan(suffix, nb_, steps)
        lastp = jnp.arange(k, dtype=jnp.int32) * nb_ + (nb_ - 1)
        return tuple(x[:, lastp] for x in total)     # [NL, k]

    part1 = weighted(a_lo, LO, 8)                    # sum (lo+1) A[lo]
    # sum hi B[hi]: shift B[1..127] down one slot (weights become 1..127)
    # and fill the vacated top slot with the group identity (NOT zeros —
    # all-zero limbs are not a valid point)
    ident = _identity_cols(k)
    b_shift = tuple(
        jnp.concatenate([x.reshape(NL, k, HI)[:, :, 1:], i_[:, :, None]],
                        axis=2).reshape(NL, k * HI)
        for x, i_ in zip(b_hi, ident))
    part2 = weighted(b_shift, HI, 7)                 # sum hi B[hi]
    for _ in range(8):                               # * 256
        part2 = padd_cols(part2, part2)
    out = padd_cols(part1, part2)
    return jnp.stack(out)


def _identity_cols(k: int):
    """4-tuple of [NL, k] identity-point limb columns (X=0,Y=1,Z=1,T=0)."""
    zeros = jnp.zeros((NL, k), jnp.int32)
    one = zeros.at[0].set(1)
    return (zeros, one, one, zeros)


# ---------------------------------------------------------------------------
# public API

class PremulTable:
    """Premultiplied (c=16) MSM table over an arbitrary fixed point set."""

    __slots__ = ("m", "src")

    def __init__(self, points):
        self.src, self.m = premul_source(points)

    def msm_many(self, vectors):
        n = self.m
        digits = np.concatenate(
            [signed_digits([v % L for v in vec], C16) for vec in vectors],
            axis=1)                                   # [n, 16k]
        sched = build_schedule16(digits, n)
        cols = _msm_premul_device(
            jnp.asarray(sched.idx), jnp.asarray(sched.segid),
            jnp.asarray(sched.last_pos), self.src, sched.k,
            sched.merge_steps)
        return _points_from_cols(cols, sched.k)
