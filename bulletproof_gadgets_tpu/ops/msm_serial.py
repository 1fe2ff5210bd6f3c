"""Serial-bucket Pippenger MSM — the fast path.

Classic Pippenger does ONE group addition per nonzero (window, point) digit
entry: add the point into its window's bucket, then weight-sum the buckets.
The scan-based path (ops/msm_cols.py) paid O(n log n) additions instead; this
module restores the optimal O(n) by making buckets TPU *lanes* and streaming
the points through them round-by-round:

  schedule  a bucket with occupancy c is split over ceil(c/T) consecutive
         pool lanes (occupancies are wildly non-uniform: scalars mod l
         have a short top window, and range-proof circuits commit bit
         vectors whose digits all hit bucket 1 — splitting keeps every
         round fully occupied).  Two builders:
         * host path (host digit arrays): two linear C passes
           (native/sched_native.c) fill idx[T, P] directly;
         * device path (digits already on device via flvec): ONE
           lax.sort_key_val orders the entry stream by bucket lane and
           the schedule matrix becomes a pure gather from the sorted
           stream — per-MSM host traffic is a [M+1] offsets readback,
           not a [T, P] matrix upload (which costs 3x the device compute
           over a remote-device link at n=2^16).
  device gather int16-packed affine rows [P | -P | id] (128 B each,
         t pre-scaled by 2d) -> Pallas bucket kernel, grid (P/blk, T/rc):
         rc fused mixed-adds per step into VMEM-resident accumulators
         (rounds-leading block layout; in-kernel fori_loop, unrolling
         blows Mosaic compile times) -> segmented-scan merge of split
         buckets -> weighted bucket->window reduction (masked scans) ->
         in-kernel Horner across the 32 windows -> [k] extended points.

Work: ~(1+sigma/sqrt(mean)) * 32n mixed-adds per MSM vs the scan path's
~32n*log2(n); the whole device pipeline is ONE jit call per launch
(point-chunked into <=2^17-point slabs for big tables — the random row
gather leaves its fast regime past ~34 MB of source).  The premultiplied
c=16 path measured 3.5x slower and was removed (docs/PERFORMANCE.md r2).

Role in the reference stack: dalek's Pippenger + AVX2 backend, invoked from
prover.prove / verifier.verify (/root/reference/src/prove.rs:79,
src/verify.rs:71; SURVEY.md §2.B).
"""
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import fp
from .msm import signed_digits
from .msm_cols import _masked_scan, _IDENT_COLS
from .pallas_curve import (_madd_body, _padd_body, padd_cols, _SUB_BIAS_COL,
                           _D2_COL, _use_interpret)
from ..core.scalar import L
from ..core.ristretto import (RistrettoPoint, batch_normalize, P as _P,
                              D as _D)
from .. import native

NL = fp.NL
C = 8                     # default window width (byte-wise digit recode)
NB = 1 << (C - 1)         # 128 buckets per window
W = 32 * 8 // C           # 32 windows per 256-bit scalar
_2D = 2 * _D % _P

# Alternative window widths for the static device path.  c=13 matches the
# F_l limb width (ops/fl.py): device digits are the normalized limbs with a
# signed recode (flvec.digits13_device), 20 windows instead of 32 -> ~1.6x
# fewer bucket additions, at the cost of 32x more bucket lanes (the pool
# floor m = w * 2^(c-1) dominates below n ~ 2^16, so c=13 is a LARGE-table
# setting).  (c, buckets/window, windows, log2 bucket-scan steps, pool cap)
# The cap bounds the POOL buffer (4 coords x NL x P x 4 B, HBM-resident;
# VMEM sees only blk-lane blocks), so c=13's cap just needs to clear its
# own bucket-lane floor k*20*4096 for the k it serves (k<=12 -> 983040).
# Pool-width cap (lanes).  The pool buffer itself is HBM-resident (VMEM
# sees blk-lane blocks), so the cap's real role is bounding the planner
# and the merge/window-scan lane work; it also sets max_stack_k, the
# widest cross-proof stacked launch the DP batch path can make.
# BPG_TPU_MSM_POOL_CAP overrides for experiments.
_POOL_CAP = int(os.environ.get("BPG_TPU_MSM_POOL_CAP", "49152"))

_WIN = {
    8: (8, 128, 32, 7, _POOL_CAP),
    13: (13, 4096, 20, 12, max(_POOL_CAP, 1 << 20)),
}

_ROUND_PAD = 8            # rounds padded to a multiple (bounds jit shapes;
                          # 8 = the Mosaic block-dim granularity _r_chunk
                          # needs — 32 cost small tables up to 3x excess
                          # rounds and large ones ~6%)
_LANE_PAD = 4096          # pool lanes padded to a multiple of the kernel block
_LANE_PAD_TIGHT = 512     # finer padding for the tight static plan


_SIGMA = float(os.environ.get("BPG_TPU_MSM_SIGMA", "2.5"))


def _select_t(total: int, m: int, pool_of_t, lane_pad: int,
              cap: int = _POOL_CAP):
    """Round budget T (mean + SIGMA*sqrt(mean) heuristic, padded, doubled
    while the padded pool exceeds the VMEM cap) and the resulting padded
    pool width.  pool_of_t(t) -> unpadded pool size for a candidate T.
    Shared by the dynamic (_plan) and static (_static_plan) planners so
    the two cannot drift (advisor r2).  SIGMA trades round-budget padding
    against split-overflow risk: the tight static plan re-runs on the safe
    shape on overflow, so 2.5 is a latency bet, not a correctness bound
    (BPG_TPU_MSM_SIGMA overrides)."""
    mean = max(1.0, total / m)
    t = int(np.ceil(mean + _SIGMA * np.sqrt(mean)))
    # pad T to the largest r_chunk granularity once T is big enough that
    # the extra rounds are noise: T=2168 padded to 8 forced rc=8 (half-size
    # kernel blocks, 4x the grid steps) and measured 211 ms at n=2^18 vs
    # the expected ~2x of n=2^17's 62 ms
    pad = 32 if t >= 512 else _ROUND_PAD
    t = -(-t // pad) * pad
    while True:
        pool = pool_of_t(t)
        p_pad = -(-(pool + 1) // lane_pad) * lane_pad
        if p_pad <= cap or t >= total:
            break
        if pool_of_t(t * 2) >= pool:
            # the pool is at its bucket-count floor (independent of T):
            # doubling T only inflates the slot matrix without shrinking
            # the pool — stop instead of walking T toward `total` (the
            # 107 GB degenerate allocation seen at 4x pool caps)
            break
        t *= 2
    if p_pad > cap:
        import warnings
        warnings.warn(
            f"MSM schedule pool {p_pad} exceeds the lane cap "
            f"{cap} even at T={t} (total={total}, m={m}); the kernel "
            "will compile but with a degenerate round count", stacklevel=3)
    return t, p_pad


class Schedule:
    __slots__ = ("idx", "segid", "last_pos", "merge_steps", "k")

    def __init__(self, idx, segid, last_pos, merge_steps, k):
        self.idx = idx
        self.segid = segid
        self.last_pos = last_pos
        self.merge_steps = merge_steps
        self.k = k


def _plan(counts: np.ndarray, total: int,
          force_t: int = None, force_p: int = None):
    """Round budget T and per-bucket pool offsets from occupancy counts.
    T ~ mean + SIGMA*sqrt(mean) so uniform digit streams rarely split."""
    m = counts.shape[0]
    if force_t is not None:
        t = force_t
        sub = -(-counts // t)
        pool = int(sub.sum())
        p_pad = force_p if force_p is not None else (
            -(-(pool + 1) // _LANE_PAD) * _LANE_PAD)
        assert pool + 1 <= p_pad, (pool, p_pad)
        offs = np.concatenate([[0], np.cumsum(sub)[:-1]]).astype(np.int32)
        return t, sub, offs, pool, p_pad
    t, p_pad = _select_t(total, m,
                         lambda tt: int((-(-counts // tt)).sum()), _LANE_PAD)
    sub = -(-counts // t)                      # ceil(c/T), 0 for empty
    pool = int(sub.sum())
    offs = np.concatenate([[0], np.cumsum(sub)[:-1]]).astype(np.int32)
    return t, sub, offs, pool, p_pad


def _schedule_arrays(sub, offs, pool, p_pad, m):
    """segid [p_pad] (pad lanes get unique ids), last_pos [m] (empty buckets
    -> the identity pad lane at `pool`), merge_steps."""
    segid = np.full(p_pad, 0, dtype=np.int32)
    segid[:pool] = np.repeat(np.arange(m, dtype=np.int32), sub)
    segid[pool:] = m + np.arange(p_pad - pool, dtype=np.int32)
    last = (offs + np.maximum(sub, 1) - 1).astype(np.int32)
    last_pos = np.where(sub > 0, last, pool).astype(np.int32)
    max_sub = int(sub.max()) if m else 1
    merge_steps = max(0, int(max_sub - 1).bit_length())
    return segid, last_pos, merge_steps


def _schedule_numpy(digits: np.ndarray, n: int,
                    force_t: int = None, force_p: int = None) -> "Schedule":
    """Fallback scheduler (the C path is ~40x faster at 4M entries)."""
    wt = digits.shape[1]
    m = wt * NB
    a = np.abs(digits)
    lanes = np.arange(wt, dtype=np.int64)[None, :] * NB + a - 1
    valid = a > 0
    src = np.where(digits < 0,
                   np.arange(n, dtype=np.int64)[:, None] + n,
                   np.arange(n, dtype=np.int64)[:, None])
    lf = lanes.T.ravel()[valid.T.ravel()]
    sf = src.T.ravel()[valid.T.ravel()]
    counts = np.bincount(lf, minlength=m).astype(np.int64)
    t, sub, offs, pool, p_pad = _plan(counts, int(lf.size), force_t, force_p)
    order = np.argsort(lf, kind="stable")
    ls = lf[order]
    coffs = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(counts, out=coffs[1:])
    rank = np.arange(lf.size, dtype=np.int64) - coffs[ls]
    idx = np.full((t, p_pad), 2 * n, dtype=np.int32)
    idx[rank % t, offs[ls] + rank // t] = sf[order].astype(np.int32)
    segid, last_pos, steps = _schedule_arrays(sub, offs, pool, p_pad, m)
    return Schedule(idx, segid, last_pos, steps, wt // W)


def build_schedule(digits: np.ndarray, n: int) -> "Schedule":
    """digits [n, wt] signed c=8 digits -> balanced (round, lane) schedule.
    Identity slot = 2n (source layout [P | -P | id])."""
    return build_schedule_t(
        np.ascontiguousarray(digits.T, dtype=np.int8), n)


def build_schedule_t(digits_t: np.ndarray, n: int,
                     force_t: int = None, force_p: int = None) -> "Schedule":
    """Window-major variant: digits_t [wt, n] int8 — the native layout of
    flvec.digits_device readbacks, and the layout the C passes want (reads
    sequential; fill writes confined to one window's cache-resident lane
    stripe).

    force_t/force_p pin the (rounds, pool) shape — used by the sharded MSM,
    where every shard must compile/execute the same jit shape (the max of
    the shards' natural plans)."""
    wt, nn = digits_t.shape
    assert nn == n
    m = wt * NB
    lib = native.load()
    if lib is None:
        return _schedule_numpy(
            np.ascontiguousarray(digits_t.T, dtype=np.int32), n,
            force_t, force_p)
    dig_t = np.ascontiguousarray(digits_t, dtype=np.int8)
    counts = np.empty(m, dtype=np.int32)
    total = lib.bpg_msm_schedule_counts(
        dig_t.ctypes.data, n, wt, counts.ctypes.data)
    t, sub, offs, pool, p_pad = _plan(counts.astype(np.int64), int(total),
                                      force_t, force_p)
    idx = np.full((t, p_pad), 2 * n, dtype=np.int32)
    scratch = np.empty(m, dtype=np.int32)
    lib.bpg_msm_schedule_fill(dig_t.ctypes.data, n, wt, t,
                              p_pad, offs.ctypes.data, scratch.ctypes.data,
                              idx.ctypes.data)
    segid, last_pos, steps = _schedule_arrays(sub, offs, pool, p_pad, m)
    return Schedule(idx, segid, last_pos, steps, wt // W)


# ---------------------------------------------------------------------------
# device-side schedule construction — digits stay on the device
#
# The entry stream is sorted by bucket lane with ONE lax.sort_key_val, then
# the [T, P] schedule matrix is a pure GATHER from the sorted source list:
# pool lane p belongs to bucket segid[p], and its round-r slot holds sorted
# entry  coffs[b] + (p - offs[b]) * T + r  (lane-major assignment inside a
# bucket — any bijection of a bucket's entries onto its (round, lane) slots
# is valid, additions commute).  The only host traffic per MSM is the
# [M+1] coffs readback that sizes (T, P) and a few KB of plan arrays.


class DeviceSchedule:
    __slots__ = ("sv", "coffs", "offs", "segid", "last_pos",
                 "merge_steps", "k", "t", "p")

    def __init__(self, sv, coffs, offs, segid, last_pos, merge_steps, k, t, p):
        self.sv = sv                  # [wt*n] sorted sources (device)
        self.coffs = coffs            # [M+1] bucket offsets (device)
        self.offs = offs              # [M] pool offsets (host np)
        self.segid = segid
        self.last_pos = last_pos
        self.merge_steps = merge_steps
        self.k = k
        self.t = t
        self.p = p


@partial(jax.jit, static_argnums=(1, 2, 3))
def _entries_sorted_packed(digits_t, wt: int, n: int, nb: int = NB):
    """Packed per-window variant of _entries_sorted for the static path.

    The flat pair-sort of wt*n (key, src) int32 pairs was 42% of the whole
    static pipeline at n=2^16 (45.8 ms of 108).  Per window the bucket key
    fits in 8 bits and the signed source index in (2n).bit_length() bits, so
    one int32 carries both: a single-operand batched sort over [wt, n] rows
    moves half the bytes of the pair sort.  Zero digits pack with key NB and
    sort to the tail of their own window's row (not globally), so the bucket
    boundary layout changes: returns explicit per-bucket (starts, ends)
    instead of a shared [m+1] boundary vector.

    Returns (starts [m], ends [m], sv [wt*n]) — all device, window-major."""
    d = digits_t.astype(jnp.int32)
    a = jnp.abs(d)
    sbits = max(1, (2 * n).bit_length())
    if nb << sbits >= (1 << 31):
        # n >= 2^22: key+src no longer fit one int31 — fall back to the
        # per-window PAIR sort (same output layout, ~2x the sort bytes)
        # instead of failing at prove time (ADVICE r3 item 3).
        key8 = jnp.where(a > 0, a - 1, nb)              # [wt, n]
        i = jnp.arange(n, dtype=jnp.int32)[None, :]
        srci = jnp.where(d < 0, i + n, i)
        sk, svw = jax.lax.sort_key_val(key8, srci, dimension=1)
        sv = svw.reshape(-1)
        bounds = jnp.arange(nb + 1, dtype=jnp.int32)
        loc = jax.vmap(lambda row: jnp.searchsorted(
            row, bounds, side="left", method="scan_unrolled"))(sk)
        base = (jnp.arange(wt, dtype=jnp.int32) * n)[:, None]
        starts = (base + loc[:, :nb]).reshape(-1).astype(jnp.int32)
        ends = (base + loc[:, 1:]).reshape(-1).astype(jnp.int32)
        return starts, ends, sv
    key8 = jnp.where(a > 0, a - 1, nb)                  # [wt, n]
    i = jnp.arange(n, dtype=jnp.int32)[None, :]
    srci = jnp.where(d < 0, i + n, i)
    packed = (key8 << sbits) | srci
    (ps,) = jax.lax.sort((packed,), dimension=1)
    sv = (ps & ((1 << sbits) - 1)).reshape(-1)
    bounds = (jnp.arange(nb + 1, dtype=jnp.int32) << sbits)
    loc = jax.vmap(lambda row: jnp.searchsorted(
        row, bounds, side="left", method="scan_unrolled"))(ps)  # [wt, NB+1]
    base = (jnp.arange(wt, dtype=jnp.int32) * n)[:, None]
    starts = (base + loc[:, :nb]).reshape(-1).astype(jnp.int32)
    ends = (base + loc[:, 1:]).reshape(-1).astype(jnp.int32)
    return starts, ends, sv


@partial(jax.jit, static_argnums=(1, 2))
def _entries_sorted(digits_t, wt: int, n: int):
    """digits_t [wt, n] int8 (device) -> sorted (lane keys, sources) and
    bucket cumulative offsets coffs [wt*NB + 1]."""
    d = digits_t.astype(jnp.int32)
    a = jnp.abs(d)
    m = wt * NB
    lane = jnp.arange(wt, dtype=jnp.int32)[:, None] * NB + a - 1
    key = jnp.where(a > 0, lane, m)
    i = jnp.arange(n, dtype=jnp.int32)[None, :]
    srci = jnp.where(d < 0, i + n, i)
    sk, sv = jax.lax.sort_key_val(key.reshape(-1), srci.reshape(-1))
    coffs = jnp.searchsorted(sk, jnp.arange(m + 1, dtype=jnp.int32),
                             method="scan_unrolled").astype(jnp.int32)
    return sk, sv, coffs


def build_schedule_device(digits_t_dev, n: int) -> "DeviceSchedule":
    """digits_t_dev [wt, n] int8 ON DEVICE (e.g. flvec.digits_device output).
    One small [M+1] readback plans (T, P); everything else stays resident."""
    wt = digits_t_dev.shape[0]
    m = wt * NB
    _, sv, coffs_dev = _entries_sorted(digits_t_dev, wt, n)
    coffs = np.asarray(coffs_dev).astype(np.int64)
    counts = np.diff(coffs)
    t, sub, offs, pool, p_pad = _plan(counts, int(coffs[-1]))
    segid, last_pos, steps = _schedule_arrays(sub, offs, pool, p_pad, m)
    return DeviceSchedule(sv, coffs_dev, offs, segid, last_pos, steps,
                          wt // W, t, p_pad)


# ---------------------------------------------------------------------------
# static-shape fully-on-device scheduling — ZERO per-MSM plan readbacks
#
# The readback path above syncs on a [M+1] coffs transfer per MSM to size
# (T, P).  Over a high-latency link (the axon tunnel has been measured
# anywhere from 20 ms to ~1 s per round trip) that sync dominates the whole
# MSM.  But (T, P) admits a HARD static bound from (wt, n) alone:
#
#   pool = sum_b ceil(count_b / T) <= m + total/T <= m + wt*n/T
#
# (every nonzero bucket wastes < 1 lane of rounding, and the count mass
# itself packs into total/T lanes).  Fixing T by the usual mean + 3*sigma
# rule and P by this bound lets the ENTIRE schedule — counts, per-bucket
# lane offsets, segment ids, last-lane positions — be computed on device
# inside the same jit as the bucket pipeline.  Per MSM the host uploads
# digits (or they are already resident from flvec), dispatches ONE
# executable, and reads back [4, NL, k] points: one blocking round trip.
#
# Cost: P is ~1.5-2x the dynamic plan's pool (the bound is tight only for
# adversarial digit distributions such as the all-ones bit vectors of
# range-proof circuits), so the bucket stage does up to 2x the additions.
# That trades pure device compute for 3-4 eliminated round trips per MSM —
# a win at 20 ms RT and a landslide at degraded-tunnel latencies; set
# BPG_TPU_MSM_SCHED=readback to restore the dynamic-shape path.


def _static_plan(wt: int, n: int, safe: bool = False, c: int = C,
                 fill: float = 1.0):
    """(T, P, merge_steps) from shape alone.

    safe=False (default): TIGHT pool bound max(m, total/T) + slack.  The
    hard worst case (m + total/T — every bucket nonzero AND heavy
    concentration) costs ~2x the typical pool (BENCH_r02: shape (608, 8192)
    vs the dynamic plan's (608, 4096), i.e. ~2x the bucket additions), but
    the two regimes that real digit streams occupy — near-uniform (pool ~
    m) and bit-vector concentration (pool ~ total/T) — both fit the tight
    bound.  The kernel reports its actual pool in the result (one extra
    output column, no extra round trip); on the rare overflow the caller
    re-runs on the safe shape (_launch_static).

    safe=True: the r2 bound m + total/T, valid for ANY digit values.

    fill < 1 tells the TIGHT plan that only ~fill of the wt*n digit slots
    are nonzero (the IPA's L/R scalar vectors are half structural zeros:
    each table point lands in exactly one of L, R per round) — the round
    budget and pool shrink accordingly; a mis-estimate surfaces as pool
    overflow and re-runs on the safe shape, which never uses fill."""
    nb, cap = _WIN[c][1], _WIN[c][4]
    m = wt * nb
    total = wt * n
    if safe:
        t, p_pad = _select_t(total, m, lambda tt: m + -(-total // tt),
                             _LANE_PAD, cap)
    else:
        if fill < 1.0:
            total = max(1, int(total * fill))
            # fill-scaled plans halve T, which doubles the split-lane cost
            # of concentrated buckets (bit-vector witnesses hammer digit 1
            # of window 0 in the IPA's first round) — measured pool excess
            # ~0.5k over the lean slack at m=8192, so give fill plans more
            # headroom
            slack = 256 + (m >> 3)
        else:
            slack = 128 + (m >> 5)
        t, p_pad = _select_t(
            total, m, lambda tt: max(m, -(-total // tt)) + slack,
            _LANE_PAD_TIGHT, cap)
    # max bucket count is n (one window's digits all equal), so a bucket
    # splits over at most ceil(n/T) lanes.
    steps = max(0, int(-(-n // t) - 1).bit_length())
    return t, p_pad, steps


def _static_schedule(digits_t, wt: int, n: int, t_rounds: int, p: int,
                     nb: int = NB):
    """Shape-static on-device schedule construction: digits -> (idx [T, P],
    segid [P], last_pos [M], pool scalar).  Shared by the single-device
    static path (_msm_serial_static) and the sharded table
    (parallel/sharded_serial — each shard builds its local schedule inside
    the shard_map body, no host planning)."""
    starts, ends, sv = _entries_sorted_packed(digits_t, wt, n, nb)
    return _schedule_from_sorted(starts, ends, sv, wt, n, t_rounds, p, nb,
                                 2 * n)


def _schedule_from_sorted_scatter(starts, ends, sv, wt: int, n: int,
                                  t_rounds: int, p: int, nb: int,
                                  ident: int):
    """Scatter formulation of the schedule: every sorted entry computes its
    OWN destination slot (dst = offs[b]*T + (q - starts[b])) and one
    scatter builds the padded stream; idx is then a pure reshape+transpose
    instead of P vmapped dynamic_slices (which serialize as per-lane DMAs).
    Enabled with BPG_TPU_MSM_SCHED2=scatter."""
    m = wt * nb
    counts = ends - starts
    sub = (counts + (t_rounds - 1)) // t_rounds
    csum = jnp.cumsum(sub)
    pool = csum[-1]
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32), csum[:-1]])
    lanes = jnp.arange(p, dtype=jnp.int32)
    bucket = jnp.searchsorted(csum, lanes, side="right",
                              method="scan_unrolled").astype(jnp.int32)
    segid = jnp.where(lanes < pool, bucket, m + lanes - pool)
    last = offs + jnp.maximum(sub, 1) - 1
    last_pos = jnp.where(sub > 0, last, pool).astype(jnp.int32)
    q = jnp.arange(sv.shape[0], dtype=jnp.int32)
    # bucket of each sorted entry (starts is globally non-decreasing:
    # window blocks are ordered, buckets within a window contiguous)
    bq = (jnp.searchsorted(starts, q, side="right",
                           method="scan_unrolled").astype(jnp.int32) - 1)
    bq = jnp.clip(bq, 0, m - 1)
    valid = (q >= starts[bq]) & (q < ends[bq])
    dst = offs[bq] * t_rounds + (q - starts[bq])
    dst = jnp.where(valid, dst, p * t_rounds)          # trash slot
    padded = jnp.full((p * t_rounds + 1,), ident, jnp.int32).at[dst].set(sv)
    idx = padded[:p * t_rounds].reshape(p, t_rounds).T
    return idx, segid, last_pos, pool


def _schedule_from_sorted(starts, ends, sv, wt: int, n: int, t_rounds: int,
                          p: int, nb: int, ident: int):
    """Schedule construction from a sorted entry stream.  `ident` is the
    source-row index of the identity pad (2n for the plain layout; callers
    that remap sv into a larger source table pass that table's identity
    row)."""
    if os.environ.get("BPG_TPU_MSM_SCHED2") == "scatter":
        return _schedule_from_sorted_scatter(starts, ends, sv, wt, n,
                                             t_rounds, p, nb, ident)
    m = wt * nb
    counts = ends - starts                              # [m]
    sub = (counts + (t_rounds - 1)) // t_rounds         # ceil, 0 for empty
    csum = jnp.cumsum(sub)
    pool = csum[-1]
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32), csum[:-1]])
    lanes = jnp.arange(p, dtype=jnp.int32)
    # lane l belongs to bucket b iff offs[b] <= l < offs[b] + sub[b];
    # lanes >= pool get unique out-of-range ids so the merge never joins
    # them (they hold identity accumulators).
    bucket = jnp.searchsorted(csum, lanes, side="right",
                              method="scan_unrolled").astype(jnp.int32)
    segid = jnp.where(lanes < pool, bucket, m + lanes - pool)
    last = offs + jnp.maximum(sub, 1) - 1
    last_pos = jnp.where(sub > 0, last, pool).astype(jnp.int32)
    q = jnp.clip(segid, 0, m - 1)
    base0 = starts[q] + (lanes - offs[q]) * t_rounds
    end = ends[q]
    # Lane l's schedule entries are sv[base0[l] : base0[l]+T] — CONSECUTIVE
    # runs of the sorted stream, so the big gather is P contiguous T-slices
    # (vmapped dynamic_slice), not T*P random scalar reads (the scalar-
    # gather formulation measured 42 ms of a 101 ms MSM at n=2^17).  sv is
    # padded with T identity entries so no slice ever clamps (clamping
    # would shift a tail bucket's start and misalign its valid prefix).
    sv_pad = jnp.concatenate(
        [sv, jnp.full((t_rounds,), ident, jnp.int32)])
    base0c = jnp.clip(base0, 0, sv.shape[0])
    picked = jax.vmap(
        lambda s: jax.lax.dynamic_slice(sv_pad, (s,), (t_rounds,)))(base0c)
    rank = base0[None, :] + jnp.arange(t_rounds, dtype=jnp.int32)[:, None]
    valid = (segid[None, :] < m) & (rank < end[None, :])
    idx = jnp.where(valid, picked.T, ident)
    return idx, segid, last_pos, pool


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9))
def _msm_serial_static_remapped(digits_t, src, remap, wt: int, n: int,
                                t_rounds: int, p: int, k: int,
                                merge_steps: int, c: int = C):
    """Static MSM over a COMPACTED digit matrix: column j of vector v
    holds the digit of source row remap[v, j] (remap[v, n + j] for the
    negated row, remap[v, 2n] = the identity row).  Used by the fused IPA,
    whose L/R scalar vectors are complementary halves of the table — the
    compact layout halves the entry sort and digit recode
    (ops/ipa_device._scalars_compact)."""
    nb = _WIN[c][1]
    w = wt // k
    starts, ends, sv = _entries_sorted_packed(digits_t, wt, n, nb)
    # per-vector remap: the flat sorted stream is window-row-major, so
    # rows [v*w*n, (v+1)*w*n) belong to vector v
    parts = []
    for v in range(k):
        seg = sv[v * w * n:(v + 1) * w * n]
        parts.append(jnp.take(remap[v], seg))
    sv = jnp.concatenate(parts)
    ident = src.shape[0] - 1
    idx, segid, last_pos, pool = _schedule_from_sorted(
        starts, ends, sv, wt, n, t_rounds, p, nb, ident)
    cols = _pipeline(idx, segid, last_pos, src, k, merge_steps, c)
    extra = jnp.zeros((4, NL, 1), jnp.int32).at[0, 0, 0].set(pool)
    return jnp.concatenate([cols, extra], axis=2)


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8))
def _msm_serial_static(digits_t, src, wt: int, n: int, t_rounds: int,
                       p: int, k: int, merge_steps: int, c: int = C):
    """Digits -> points in ONE device program: sort, schedule, bucket
    pipeline.  No host planning, no data-dependent shapes.

    Returns [4, NL, k+1]: the first k columns are the extended points, the
    extra column carries the actual pool size in limb (0, 0) so the host
    can detect tight-plan overflow from the SAME readback (zero extra round
    trips; see _static_plan/_launch_static)."""
    idx, segid, last_pos, pool = _static_schedule(digits_t, wt, n,
                                                  t_rounds, p, _WIN[c][1])
    cols = _pipeline(idx, segid, last_pos, src, k, merge_steps, c)
    extra = jnp.zeros((4, NL, 1), jnp.int32).at[0, 0, 0].set(pool)
    return jnp.concatenate([cols, extra], axis=2)


# Point-chunking threshold: the schedule's random row gather runs ~12x
# slower once the source table exceeds ~34 MB (measured n=2^18: the
# marginal gather went 9.6 ms -> 118 ms while slots merely doubled — the
# table left a fast on-chip staging regime).  Tables larger than this are
# split into <=2^17-point chunks, each running the full static pipeline
# against its own contiguous [P_c | -P_c | id] slab; the per-chunk
# [NL, k*W] window sums combine with the group law (the same
# decomposition parallel/sharded_serial uses across devices).
_POINT_CHUNK = 1 << 17


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8))
def _msm_serial_static_ws(digits_t, src, wt: int, n: int, t_rounds: int,
                          p: int, k: int, merge_steps: int, c: int = C):
    """Static pipeline up to (and including) the weighted window sums:
    returns ([4, NL, k*W] stacked sums, pool scalar)."""
    idx, segid, last_pos, pool = _static_schedule(digits_t, wt, n,
                                                  t_rounds, p, _WIN[c][1])
    ws = _window_sums_part(idx, segid, last_pos, src, k, merge_steps, c)
    return jnp.stack(ws), pool


@partial(jax.jit, static_argnums=(1, 2))
def _chunk_src(src, n: int, lo: int):
    """Contiguous per-chunk source slab [P_lo.. | -P_lo.. | id]."""
    hi = min(n, lo + _POINT_CHUNK)
    return jnp.concatenate(
        [jax.lax.dynamic_slice_in_dim(src, lo, hi - lo, 0),
         jax.lax.dynamic_slice_in_dim(src, n + lo, hi - lo, 0),
         src[-1:]], axis=0)


def _combine_ws_horner_impl(stacked, k: int, c: int):
    """[D, 4, NL, kW] chunk window sums -> [4, NL, k] final points."""
    cur = tuple(stacked[0, i] for i in range(4))
    for d in range(1, stacked.shape[0]):
        cur = padd_cols(cur, tuple(stacked[d, i] for i in range(4)))
    return _horner_part(cur, k, c)


_combine_ws_horner = partial(jax.jit, static_argnums=(1, 2))(
    _combine_ws_horner_impl)


def _chunk_plans(wt: int, n: int, c: int, safe: bool = False):
    """[(lo, h, t, p, steps)] per point chunk."""
    plans = []
    lo = 0
    while lo < n:
        h = min(_POINT_CHUNK, n - lo)
        t, p, steps = _static_plan(wt, h, safe=safe, c=c)
        plans.append((lo, h, t, p, steps))
        lo += h
    return plans


def _launch_static_async(digits_t_dev, src, n: int, c: int = C):
    """Dispatch the tight-plan MSM without syncing: returns opaque pending
    state for _launch_static_finish.  Lets callers pipeline several
    launches before paying a readback round trip each."""
    wt = digits_t_dev.shape[0]
    k = wt // _WIN[c][2]
    if n <= _POINT_CHUNK:
        t, p, steps = _static_plan(wt, n, c=c)
        pend = _msm_serial_static(digits_t_dev, src, wt, n, t, p, k,
                                  steps, c)
        return ("one", pend, digits_t_dev, src, wt, n, p, k, c)
    pends = []
    for lo, h, t, p, steps in _chunk_plans(wt, n, c):
        src_c = _chunk_src(src, n, lo)
        pends.append((_msm_serial_static_ws(
            digits_t_dev[:, lo:lo + h], src_c, wt, h, t, p, k, steps, c),
            p))
    cols = _combine_ws_horner(jnp.stack([w for (w, _), _ in pends]), k, c)
    pools = jnp.stack([pl for (_, pl), _ in pends])
    return ("chunked", cols, pools, [pp for _, pp in pends],
            digits_t_dev, src, wt, n, k, c)


def _launch_static_finish(pending):
    if pending[0] == "one":
        _, pend, digits_t_dev, src, wt, n, p, k, c = pending
        arr = np.asarray(pend)
        if int(arr[0, 0, k]) >= p:                     # tight pool overflow
            t2, p2, steps2 = _static_plan(wt, n, safe=True, c=c)
            arr = np.asarray(_msm_serial_static(digits_t_dev, src, wt, n,
                                                t2, p2, k, steps2, c))
        return _points_from_cols(arr[:, :, :k], k)
    _, cols, pools, ps, digits_t_dev, src, wt, n, k, c = pending
    pools_np = np.asarray(pools)
    if any(int(pools_np[i]) >= ps[i] for i in range(len(ps))):
        # overflow in some chunk: redo everything on safe chunk shapes
        pends = []
        for lo, h, t, p, steps in _chunk_plans(wt, n, c, safe=True):
            src_c = _chunk_src(src, n, lo)
            pends.append(_msm_serial_static_ws(
                digits_t_dev[:, lo:lo + h], src_c, wt, h, t, p, k, steps,
                c)[0])
        cols = _combine_ws_horner(jnp.stack(pends), k, c)
    return _points_from_cols(np.asarray(cols), k)


def _launch_static(digits_t_dev, src, n: int, c: int = C):
    """Tight static plan first; on pool overflow (rare — adversarial digit
    mixes only) re-run on the r2 safe-bound shape, compiled lazily."""
    return _launch_static_finish(_launch_static_async(digits_t_dev, src, n,
                                                      c))


@partial(jax.jit, static_argnums=(1,))
def _enc_pool(cols, k: int):
    """[4, NL, k+1] pipeline output -> [k*32 + 1] int32: the k compressed
    encodings (device Ristretto compress) followed by the pool scalar."""
    from .ristretto_device import compress_cols
    enc = compress_cols(cols[:, :, :k])
    return jnp.concatenate([enc.reshape(-1),
                            cols[0, 0, k].reshape(1)])


@partial(jax.jit, static_argnums=(1,))
def _enc_only(cols, k: int):
    from .ristretto_device import compress_cols
    return compress_cols(cols[:, :, :k]).reshape(-1)


def _launch_static_enc_async(digits_t_dev, src, n: int, c: int = C):
    """Like _launch_static_async, but the points compress ON DEVICE
    (ops/ristretto_device) — the caller gets 32-byte encodings, saving the
    per-point host from_limbs + compress (~1.5 ms each; the transcript only
    ever absorbs the encodings)."""
    wt = digits_t_dev.shape[0]
    k = wt // _WIN[c][2]
    if n <= _POINT_CHUNK:
        t, p, steps = _static_plan(wt, n, c=c)
        cols = _msm_serial_static(digits_t_dev, src, wt, n, t, p, k,
                                  steps, c)
        return ("one", _enc_pool(cols, k), digits_t_dev, src, wt, n, p, k, c)
    pends = []
    for lo, h, t, p, steps in _chunk_plans(wt, n, c):
        src_c = _chunk_src(src, n, lo)
        pends.append((_msm_serial_static_ws(
            digits_t_dev[:, lo:lo + h], src_c, wt, h, t, p, k, steps, c),
            p))
    cols = _combine_ws_horner(jnp.stack([w for (w, _), _ in pends]), k, c)
    enc = _enc_only(
        jnp.concatenate([cols, jnp.zeros((4, NL, 1), jnp.int32)], axis=2), k)
    pools = jnp.stack([pl for (_, pl), _ in pends])
    return ("chunked", enc, pools, [pp for _, pp in pends],
            digits_t_dev, src, wt, n, k, c)


def _launch_static_enc_finish(pending):
    """Returns list[k] of 32-byte compressed encodings."""
    if pending[0] == "one":
        _, pend, digits_t_dev, src, wt, n, p, k, c = pending
        arr = np.asarray(pend)
        if int(arr[-1]) >= p:                          # tight pool overflow
            t2, p2, steps2 = _static_plan(wt, n, safe=True, c=c)
            cols = _msm_serial_static(digits_t_dev, src, wt, n, t2, p2, k,
                                      steps2, c)
            arr = np.asarray(_enc_pool(cols, k))
        return [bytes(arr[32 * i:32 * i + 32].astype(np.uint8))
                for i in range(k)]
    _, enc, pools, ps, digits_t_dev, src, wt, n, k, c = pending
    enc_np = np.asarray(enc)
    pools_np = np.asarray(pools)
    if any(int(pools_np[i]) >= ps[i] for i in range(len(ps))):
        pends = []
        for lo, h, t, p, steps in _chunk_plans(wt, n, c, safe=True):
            src_c = _chunk_src(src, n, lo)
            pends.append(_msm_serial_static_ws(
                digits_t_dev[:, lo:lo + h], src_c, wt, h, t, p, k, steps,
                c)[0])
        cols = _combine_ws_horner(jnp.stack(pends), k, c)
        enc_np = np.asarray(_enc_only(
            jnp.concatenate([cols, jnp.zeros((4, NL, 1), jnp.int32)],
                            axis=2), k))
    return [bytes(enc_np[32 * i:32 * i + 32].astype(np.uint8))
            for i in range(k)]


@partial(jax.jit, static_argnums=(6, 7, 8, 9, 10))
def _msm_serial_device_sorted(sv, coffs, offs, segid, last_pos, src,
                              t_rounds: int, p: int, k: int,
                              merge_steps: int, ident: int):
    """Schedule-matrix-free MSM: builds idx [T, P] on device by gathering
    from the sorted entry stream, then runs the shared pipeline."""
    m = last_pos.shape[0]
    q = jnp.clip(segid, 0, m - 1)                   # [P]
    lanes = jnp.arange(p, dtype=jnp.int32)
    base0 = coffs[q] + (lanes - offs[q]) * t_rounds
    end = coffs[q + 1]
    rank = base0[None, :] + jnp.arange(t_rounds, dtype=jnp.int32)[:, None]
    valid = (segid[None, :] < m) & (rank < end[None, :])
    picked = jnp.take(sv, jnp.clip(rank, 0, sv.shape[0] - 1).reshape(-1))
    idx = jnp.where(valid, picked.reshape(t_rounds, p), ident)
    return _pipeline(idx, segid, last_pos, src, k, merge_steps)


def _launch_device(sched: "DeviceSchedule", src, n: int):
    cols = _msm_serial_device_sorted(
        sched.sv, sched.coffs, jnp.asarray(sched.offs),
        jnp.asarray(sched.segid), jnp.asarray(sched.last_pos), src,
        sched.t, sched.p, sched.k, sched.merge_steps, 2 * n)
    return _points_from_cols(cols, sched.k)


# ---------------------------------------------------------------------------
# affine source tables (device)

def prep_source(points):
    """list[RistrettoPoint] -> (source [2n+1, 64] int16 device array, n).

    Row layout packs all three affine coordinates so the schedule gather is
    ONE row-gather (measured: XLA gather cost is per-row, not per-byte):
    cols 0:20 = x limbs, 20:40 = y limbs, 40:60 = t2d limbs, 60:64 = pad,
    where t2d = x*y*2d mod p (pre-scaled so the kernel saves the 2d mul).
    13-bit limbs ship as int16 — rows are 128 B instead of 256 B, halving
    the HBM traffic of the schedule gather (the pipeline's second-largest
    cost); the bucket kernel widens to int32 in VMEM.
    Rows: [P_0..P_{n-1} | -P_0..-P_{n-1} | identity]."""
    n = len(points)
    aff = batch_normalize(points)
    xs = [pt.X for pt in aff]
    ys = [pt.Y for pt in aff]
    t2ds = [pt.T * _2D % _P for pt in aff]
    rows = np.zeros((2 * n + 1, 64), dtype=np.int16)
    rows[:, 0:20] = fp.ints_to_limbs_cols(
        xs + [(_P - x) % _P for x in xs] + [0]).T
    rows[:, 20:40] = fp.ints_to_limbs_cols(ys + ys + [1]).T
    rows[:, 40:60] = fp.ints_to_limbs_cols(
        t2ds + [(_P - t) % _P for t in t2ds] + [0]).T
    return jnp.asarray(rows), n


# ---------------------------------------------------------------------------
# device pipeline

def _bucket_kernel(bias, gx, gy, gt, ox, oy, oz, ot, *, r_chunk: int):
    """r_chunk rounds per grid step.  Blocks are [rc, NL, blk] with rounds
    LEADING (untiled), so the in-kernel fori_loop can index them dynamically
    without unrolling the madd body r_chunk times (unrolled variants blow
    Mosaic compile time up by minutes per shape)."""
    rc = pl.program_id(1)

    @pl.when(rc == 0)
    def _():
        row = jax.lax.broadcasted_iota(jnp.int32, ox.shape, 0)
        one = (row == 0).astype(jnp.int32)
        ox[:] = jnp.zeros_like(ox)
        oy[:] = one
        oz[:] = one
        ot[:] = jnp.zeros_like(ot)

    def body(rr, acc):
        return _madd_body(bias[:], *acc,
                          gx[rr].astype(jnp.int32),
                          gy[rr].astype(jnp.int32),
                          gt[rr].astype(jnp.int32))

    acc = (ox[:], oy[:], oz[:], ot[:])
    acc = jax.lax.fori_loop(0, r_chunk, body, acc)
    ox[:], oy[:], oz[:], ot[:] = acc


def _bucket_kernel_cont(bias, ix, iy, iz, it, gx, gy, gt, ox, oy, oz, ot,
                        *, r_chunk: int):
    """Accumulator-carrying variant of _bucket_kernel: the pool state
    enters as an input instead of being initialized to identity — used by
    the round-chunked path, where one MSM's bucket accumulation spans
    several pallas launches (the gathered [T, 64, P] source for a 2^21-row
    table would otherwise materialize ~22 GB; chunking caps it)."""
    rc = pl.program_id(1)

    @pl.when(rc == 0)
    def _():
        ox[:], oy[:], oz[:], ot[:] = ix[:], iy[:], iz[:], it[:]

    def body(rr, acc):
        return _madd_body(bias[:], *acc,
                          gx[rr].astype(jnp.int32),
                          gy[rr].astype(jnp.int32),
                          gt[rr].astype(jnp.int32))

    acc = (ox[:], oy[:], oz[:], ot[:])
    acc = jax.lax.fori_loop(0, r_chunk, body, acc)
    ox[:], oy[:], oz[:], ot[:] = acc


def _bucket_kernel_rows(bias, g64, ox, oy, oz, ot, *, r_chunk: int):
    """Row-layout variant: consumes the gathered [rc, blk, 64] int16 rows
    directly and performs the int32 widen + (blk, 64) -> (64, blk)
    transpose IN-KERNEL, so the [T, 64, P] int32 array (the pipeline's
    single largest HBM transient: write + read ~2.6 GB at n=2^17) never
    materializes.  Measured 1.9x on the full MSM at n=2^17 (61.5 vs
    117.7 ms same-session A/B, scripts/probe_rows.py) — the DEFAULT;
    BPG_TPU_MSM_ROWS=0 restores the pre-transposed path."""
    rc = pl.program_id(1)

    @pl.when(rc == 0)
    def _():
        row = jax.lax.broadcasted_iota(jnp.int32, ox.shape, 0)
        one = (row == 0).astype(jnp.int32)
        ox[:] = jnp.zeros_like(ox)
        oy[:] = one
        oz[:] = one
        ot[:] = jnp.zeros_like(ot)

    def body(rr, acc):
        g = g64[rr].astype(jnp.int32).T             # [64, blk]
        return _madd_body(bias[:], *acc,
                          g[0:NL], g[NL:2 * NL], g[2 * NL:3 * NL])

    acc = (ox[:], oy[:], oz[:], ot[:])
    acc = jax.lax.fori_loop(0, r_chunk, body, acc)
    ox[:], oy[:], oz[:], ot[:] = acc


def _bucket_kernel_rows_cont(bias, ix, iy, iz, it, g64, ox, oy, oz, ot,
                             *, r_chunk: int):
    """Accumulator-carrying row-layout variant (round-chunked big tables:
    one MSM's accumulation spans several launches)."""
    rc = pl.program_id(1)

    @pl.when(rc == 0)
    def _():
        ox[:], oy[:], oz[:], ot[:] = ix[:], iy[:], iz[:], it[:]

    def body(rr, acc):
        g = g64[rr].astype(jnp.int32).T             # [64, blk]
        return _madd_body(bias[:], *acc,
                          g[0:NL], g[NL:2 * NL], g[2 * NL:3 * NL])

    acc = (ox[:], oy[:], oz[:], ot[:])
    acc = jax.lax.fori_loop(0, r_chunk, body, acc)
    ox[:], oy[:], oz[:], ot[:] = acc


def _bucket_kernel2d(bias, gx, gy, gt, ox, oy, oz, ot):
    """rc=1 variant over a flat [NL, T*P] gathered layout."""
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        row = jax.lax.broadcasted_iota(jnp.int32, ox.shape, 0)
        one = (row == 0).astype(jnp.int32)
        ox[:] = jnp.zeros_like(ox)
        oy[:] = one
        oz[:] = one
        ot[:] = jnp.zeros_like(ot)

    x, y, z, t = _madd_body(bias[:], ox[:], oy[:], oz[:], ot[:],
                            gx[:].astype(jnp.int32),
                            gy[:].astype(jnp.int32),
                            gt[:].astype(jnp.int32))
    ox[:], oy[:], oz[:], ot[:] = x, y, z, t


def _horner_kernel(bias, d2, wx, wy, wz, wt, ox, oy, oz, ot, *,
                   c: int = C):
    """Grid (W,) high-to-low window; out = sum_w 2^(c*w) * ws[w]."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        ox[:], oy[:], oz[:], ot[:] = wx[0], wy[0], wz[0], wt[0]

    @pl.when(i > 0)
    def _():
        acc = (ox[:], oy[:], oz[:], ot[:])
        # fori_loop (not a Python unroll): c inlined padd bodies per grid
        # step blow up both Mosaic and interpret-mode compile times.
        acc = jax.lax.fori_loop(
            0, c, lambda _, a: _padd_body(bias[:], d2[:], *a, *a), acc)
        acc = _padd_body(bias[:], d2[:], *acc, wx[0], wy[0], wz[0], wt[0])
        ox[:], oy[:], oz[:], ot[:] = acc


def _seg_scan(x, segid, steps: int):
    """Inclusive prefix scan (group law) within contiguous runs of equal
    segid along lanes; sub-lanes of a split bucket merge into the run's
    last lane."""
    if steps == 0:
        return x
    p = x[0].shape[1]
    lane = jnp.arange(p, dtype=jnp.int32)

    def body(s, acc):
        shift = jnp.int32(1) << s
        same = (segid == jnp.roll(segid, shift)) & (lane >= shift)
        shifted = tuple(jnp.roll(leaf, shift, axis=1) for leaf in acc)
        addend = tuple(jnp.where(same[None, :], a, jnp.asarray(i))
                       for a, i in zip(shifted, _IDENT_COLS))
        return padd_cols(acc, addend)

    return jax.lax.fori_loop(0, steps, body, x)


# ---------------------------------------------------------------------------
# fused scan kernels: the merge scan (up to ~7 steps) and the double masked
# window scan (14 steps) each used to run as one padd_cols PALLAS LAUNCH PER
# STEP with XLA roll/where glue between launches — ~21 launches and ~60 tiny
# ops per MSM.  At large n the arrays are only [NL, ~4.6k] so the XLA cost
# was small, but every launch+glue op is pure latency on the small MSMs the
# fused IPA's post-fold rounds run; these kernels execute ALL steps of a
# scan in one VMEM-resident pallas call (profiler-verified 0.7 ms for
# merge+window+horner combined at n=2^17).

def _ident_cols_in_kernel():
    """In-kernel identity point columns [NL, 1]: X=T=0, Y=Z=1 at limb 0."""
    row = jax.lax.broadcasted_iota(jnp.int32, (NL, 1), 0)
    one = (row == 0).astype(jnp.int32)
    zero = jnp.zeros((NL, 1), jnp.int32)
    return zero, one, one, zero


def _merge_scan_kernel(bias, d2, segid, x, y, z, t, ox, oy, oz, ot,
                       *, steps: int):
    """All `steps` Hillis-Steele segmented-merge steps in one launch.
    segid [1, P]; coords [NL, P]."""
    acc = (x[:], y[:], z[:], t[:])
    seg = segid[:]
    p = seg.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    idc = _ident_cols_in_kernel()
    b, dd = bias[:], d2[:]
    for s in range(steps):
        shift = 1 << s
        same = (seg == jnp.roll(seg, shift, axis=1)) & (lane >= shift)
        shifted = tuple(jnp.roll(a, shift, axis=1) for a in acc)
        addend = tuple(jnp.where(same, a, ic)
                       for a, ic in zip(shifted, idc))
        acc = _padd_body(b, dd, *acc, *addend)
    ox[:], oy[:], oz[:], ot[:] = acc


def _window_scan_kernel(bias, d2, x, y, z, t, ox, oy, oz, ot,
                        *, nb: int, log_steps: int):
    """Double masked suffix scan (the multiply-free sum_b b*S_b trick) with
    STATIC within-window masks, all 2*log_steps steps in one launch.
    Input is the bucket-reversed [NL, m] array (m % nb == 0)."""
    acc = (x[:], y[:], z[:], t[:])
    m = acc[0].shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1) % nb
    idc = _ident_cols_in_kernel()
    b, dd = bias[:], d2[:]
    for _ in range(2):
        for s in range(log_steps):
            shift = 1 << s
            keep = lane >= shift
            shifted = tuple(jnp.roll(a, shift, axis=1) for a in acc)
            addend = tuple(jnp.where(keep, a, ic)
                           for a, ic in zip(shifted, idc))
            acc = _padd_body(b, dd, *acc, *addend)
    ox[:], oy[:], oz[:], ot[:] = acc


# lane width past which the single-block fused scan kernels would push
# Mosaic's VMEM budget (the padd body's schoolbook mul holds ~NL wide
# intermediates); larger pools keep the per-step padd_cols path.
_FUSED_SCAN_MAX = int(os.environ.get("BPG_TPU_MSM_FUSED_SCAN_MAX", "16384"))


def _scan_params():
    return (None if _use_interpret() else
            pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024))


def _merge_scan_fused(pool, segid, steps: int):
    p = pool[0].shape[1]
    if steps == 0:
        return pool
    if p > _FUSED_SCAN_MAX or os.environ.get(
            "BPG_TPU_MSM_FUSED_SCAN", "1") != "1":
        return _seg_scan(pool, segid, steps)
    cspec = pl.BlockSpec((NL, 1), lambda: (0, 0), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, p), lambda: (0, 0), memory_space=pltpu.VMEM)
    spec = pl.BlockSpec((NL, p), lambda: (0, 0), memory_space=pltpu.VMEM)
    return tuple(pl.pallas_call(
        partial(_merge_scan_kernel, steps=steps),
        in_specs=[cspec, cspec, sspec] + [spec] * 4,
        out_specs=[spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((NL, p), jnp.int32)] * 4,
        compiler_params=_scan_params(),
        interpret=_use_interpret(),
    )(jnp.asarray(_SUB_BIAS_COL), jnp.asarray(_D2_COL),
      segid.reshape(1, p), *pool))


def _window_scan_fused(rev, nb: int, log_steps: int):
    m = rev[0].shape[1]
    if m > _FUSED_SCAN_MAX or os.environ.get(
            "BPG_TPU_MSM_FUSED_SCAN", "1") != "1":
        return _masked_scan(_masked_scan(rev, nb, log_steps), nb, log_steps)
    cspec = pl.BlockSpec((NL, 1), lambda: (0, 0), memory_space=pltpu.VMEM)
    spec = pl.BlockSpec((NL, m), lambda: (0, 0), memory_space=pltpu.VMEM)
    return tuple(pl.pallas_call(
        partial(_window_scan_kernel, nb=nb, log_steps=log_steps),
        in_specs=[cspec, cspec] + [spec] * 4,
        out_specs=[spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((NL, m), jnp.int32)] * 4,
        compiler_params=_scan_params(),
        interpret=_use_interpret(),
    )(jnp.asarray(_SUB_BIAS_COL), jnp.asarray(_D2_COL), *rev))


_BLK = 4096               # bucket-kernel lane block (~3.2 MB VMEM)


def _blk_for(p: int) -> int:
    """Largest lane block <= _BLK dividing p (p is a multiple of
    _LANE_PAD_TIGHT by construction; 512 always divides)."""
    if p <= _BLK:
        return p
    for b in (4096, 3072, 2048, 1536, 1024, 512):
        if p % b == 0:
            return b
    raise AssertionError(f"pool width {p} not a multiple of 512")


def _r_chunk(t_rounds: int) -> int:
    """Rounds folded into one grid step (amortizes per-step overhead; the
    in-spec block grows to [NL, rc, blk] ≈ rc * 0.33 MB per coordinate).
    Mosaic requires the middle block dim be a multiple of 8, so valid
    values are 1 (2D fallback) or multiples of 8 dividing T (T is padded
    to a multiple of _ROUND_PAD = 8)."""
    rc = int(os.environ.get("BPG_TPU_MSM_RCHUNK", "32"))
    while rc > 1 and (t_rounds % rc or rc % 8):
        rc //= 2
    return max(rc, 1)


@partial(jax.jit, static_argnums=(4, 5))
def _msm_serial_device(idx, segid, last_pos, src, k: int, merge_steps: int):
    """idx [T, P]; segid [P]; last_pos [M=k*W*NB]; src [S, 64] packed rows.
    Returns ONE [4, NL, k] array (one extended point per vector) so the
    host pays a single readback round trip."""
    return _pipeline(idx, segid, last_pos, src, k, merge_steps)


def _pipeline(idx, segid, last_pos, src, k: int, merge_steps: int,
              c: int = C):
    ws = _window_sums_part(idx, segid, last_pos, src, k, merge_steps, c)
    return _horner_part(ws, k, c)


# Round-chunking threshold: the gathered source materializes T*P rows of
# 64 int16 + an int32 widened/transposed copy (~384 B per slot transient);
# past ~18M slots (~6.9 GB transient) chunk the rounds axis so memory stays
# bounded regardless of table size (the 2^21-row stress table needs 86M
# slots = ~33 GB unchunked).  MEASURED round 4: the chunked path costs
# ~3.3x, not the ~10% round 3 estimated (k=3 at n=2^17: 562 ms chunked vs
# 168 ms unchunked), so the budget sits as high as HBM allows — above the
# k=3 prover launch at n=2^17 (14.7M slots) — and chunking is strictly a
# stress-scale fallback.
_SLOT_BUDGET = 18 * 1024 * 1024


def _gather_g3(idx_rows, src, t, p):
    """[t, p] idx -> rounds-leading int32 coordinate blocks.
    Widen BEFORE the transpose: XLA's int16 transpose is ~5x slower than
    int32 (measured 316 vs 57 ms full-pipeline at n=2^16); the int16 win
    stays where it matters, the random-access row gather."""
    g64 = jnp.take(src, idx_rows.reshape(-1), axis=0)   # [t*p, 64] int16
    g3 = g64.astype(jnp.int32).reshape(t, p, 64).transpose(0, 2, 1)
    return (g3[:, 0:NL], g3[:, NL:2 * NL], g3[:, 2 * NL:3 * NL])


def _window_sums_part(idx, segid, last_pos, src, k: int, merge_steps: int,
                      c: int = C):
    """Bucket accumulation + merge + weighted window reduction.
    Returns a 4-tuple of [NL, k*W] extended-coordinate window sums —
    the shardable intermediate (window sums over disjoint point subsets
    add with the group law; see parallel/sharded_serial.py)."""
    t_rounds, p = idx.shape
    m = last_pos.shape[0]

    bias = jnp.asarray(_SUB_BIAS_COL)
    d2 = jnp.asarray(_D2_COL)
    blk = _blk_for(p)
    nb = p // blk
    rc = _r_chunk(t_rounds)
    ospec = pl.BlockSpec((NL, blk), lambda j, r: (0, j),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((NL, 1), lambda j, r: (0, 0),
                         memory_space=pltpu.VMEM)
    # rc > 1 blocks are rc * 0.33 MB per coordinate; the Mosaic default
    # scoped-VMEM budget (16 MB) only fits rc=1 at blk=4096, so raise it
    # (v5e/v6e have 128 MB VMEM).
    params = (None if _use_interpret() else
              pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024))

    if rc > 1 and t_rounds * p > _SLOT_BUDGET:
        # chunked accumulation: slice Tc rounds at a time, gather only that
        # chunk's sources, and carry the pool through an accumulator-input
        # kernel inside a fori_loop (one compiled chunk graph).
        tc = max(rc, (_SLOT_BUDGET // p) // rc * rc)
        n_chunks = -(-t_rounds // tc)
        t_pad = n_chunks * tc
        if t_pad > t_rounds:
            ident_row = src.shape[0] - 1
            idx = jnp.concatenate(
                [idx, jnp.full((t_pad - t_rounds, p), ident_row,
                               jnp.int32)], axis=0)
        rows_mode = os.environ.get("BPG_TPU_MSM_ROWS", "1") == "1"
        if rows_mode:
            spec = pl.BlockSpec((rc, blk, 64), lambda j, r: (r, j, 0),
                                memory_space=pltpu.VMEM)
        else:
            spec = pl.BlockSpec((rc, NL, blk), lambda j, r: (r, 0, j),
                                memory_space=pltpu.VMEM)

        def chunk_body(c, acc):
            idx_c = jax.lax.dynamic_slice(idx, (c * tc, 0), (tc, p))
            if rows_mode:
                g64r = jnp.take(src, idx_c.reshape(-1), axis=0).reshape(
                    tc, p, 64)
                return tuple(pl.pallas_call(
                    partial(_bucket_kernel_rows_cont, r_chunk=rc),
                    grid=(nb, tc // rc),
                    in_specs=[cspec] + [ospec] * 4 + [spec],
                    out_specs=[ospec] * 4,
                    out_shape=[jax.ShapeDtypeStruct((NL, p),
                                                    jnp.int32)] * 4,
                    compiler_params=params,
                    interpret=_use_interpret(),
                )(bias, *acc, g64r))
            g = _gather_g3(idx_c, src, tc, p)
            return tuple(pl.pallas_call(
                partial(_bucket_kernel_cont, r_chunk=rc),
                grid=(nb, tc // rc),
                in_specs=[cspec] + [ospec] * 4 + [spec] * 3,
                out_specs=[ospec] * 4,
                out_shape=[jax.ShapeDtypeStruct((NL, p), jnp.int32)] * 4,
                compiler_params=params,
                interpret=_use_interpret(),
            )(bias, *acc, *g))

        row = jnp.arange(NL, dtype=jnp.int32)[:, None]
        one = jnp.broadcast_to((row == 0).astype(jnp.int32), (NL, p))
        zero = jnp.zeros((NL, p), jnp.int32)
        pool = jax.lax.fori_loop(0, n_chunks, chunk_body,
                                 (zero, one, one, zero))
    elif rc > 1 and os.environ.get("BPG_TPU_MSM_ROWS", "1") == "1":
        # row-layout kernel: gather only, widen+transpose in-kernel
        # (see _bucket_kernel_rows; 1.9x measured)
        g64r = jnp.take(src, idx.reshape(-1), axis=0).reshape(
            t_rounds, p, 64)
        spec = pl.BlockSpec((rc, blk, 64), lambda j, r: (r, j, 0),
                            memory_space=pltpu.VMEM)
        pool = pl.pallas_call(
            partial(_bucket_kernel_rows, r_chunk=rc),
            grid=(nb, t_rounds // rc),
            in_specs=[cspec, spec],
            out_specs=[ospec] * 4,
            out_shape=[jax.ShapeDtypeStruct((NL, p), jnp.int32)] * 4,
            compiler_params=params,
            interpret=_use_interpret(),
        )(bias, g64r)
    else:
        if rc == 1:
            flat = idx.reshape(-1)
            g64 = jnp.take(src, flat, axis=0)           # [T*P, 64] int16
            g64t = g64.astype(jnp.int32).T              # [64, T*P]
            g = (g64t[0:NL], g64t[NL:2 * NL], g64t[2 * NL:3 * NL])
            spec = pl.BlockSpec((NL, blk), lambda j, r: (0, r * nb + j),
                                memory_space=pltpu.VMEM)
            kernel = partial(_bucket_kernel2d)
        else:
            # rounds-leading layout [T, NL, P]: untiled lead dim -> the
            # kernel fori_loop indexes rounds dynamically.
            g = _gather_g3(idx, src, t_rounds, p)
            spec = pl.BlockSpec((rc, NL, blk), lambda j, r: (r, 0, j),
                                memory_space=pltpu.VMEM)
            kernel = partial(_bucket_kernel, r_chunk=rc)
        pool = pl.pallas_call(
            kernel,
            grid=(nb, t_rounds // rc),
            in_specs=[cspec] + [spec] * 3,
            out_specs=[ospec] * 4,
            out_shape=[jax.ShapeDtypeStruct((NL, p), jnp.int32)] * 4,
            compiler_params=params,
            interpret=_use_interpret(),
        )(bias, *g)

    # merge split buckets, then gather canonical [NL, M] bucket sums
    merged = _merge_scan_fused(tuple(pool), segid, merge_steps)
    buckets = tuple(x[:, last_pos] for x in merged)

    # weighted window sums: sum_b b*S_b per window via double suffix scan
    nb, log_steps = _WIN[c][1], _WIN[c][3]
    rev = tuple(x.reshape(NL, m // nb, nb)[:, :, ::-1].reshape(NL, m)
                for x in buckets)
    total = _window_scan_fused(rev, nb, log_steps)
    lastpos_w = (jnp.arange(m // nb, dtype=jnp.int32) * nb + (nb - 1))
    return tuple(x[:, lastpos_w] for x in total)        # [NL, k*W]


def _horner_part(ws, k: int, c: int = C):
    bias = jnp.asarray(_SUB_BIAS_COL)
    d2 = jnp.asarray(_D2_COL)
    w = _WIN[c][2]
    # Horner across windows, per vector, in one kernel launch.
    # lane order is [vector-major, window-minor]; kernel wants [W, NL, k]
    # with the high window first (index map below reverses).
    ws3 = tuple(x.reshape(NL, k, w).transpose(2, 0, 1) for x in ws)
    wspec = pl.BlockSpec((1, NL, k), lambda i: (w - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM)
    pospec = pl.BlockSpec((NL, k), lambda i: (0, 0), memory_space=pltpu.VMEM)
    hcspec = pl.BlockSpec((NL, 1), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_horner_kernel, c=c),
        grid=(w,),
        in_specs=[hcspec, hcspec] + [wspec] * 4,
        out_specs=[pospec] * 4,
        out_shape=[jax.ShapeDtypeStruct((NL, k), jnp.int32)] * 4,
        interpret=_use_interpret(),
    )(bias, d2, *ws3)
    return jnp.stack(out)


def _points_from_cols(packed, k: int):
    """[4, NL, k] device array -> host points (ONE readback transfer)."""
    arr = np.asarray(packed)
    xs = fp.from_limbs(arr[0].T)
    ys = fp.from_limbs(arr[1].T)
    zs = fp.from_limbs(arr[2].T)
    ts = fp.from_limbs(arr[3].T)
    return [RistrettoPoint(xs[i], ys[i], zs[i], ts[i]) for i in range(k)]


def _launch(sched: "Schedule", src):
    cols = _msm_serial_device(jnp.asarray(sched.idx),
                              jnp.asarray(sched.segid),
                              jnp.asarray(sched.last_pos),
                              src, sched.k, sched.merge_steps)
    return _points_from_cols(cols, sched.k)


def msm_many(vectors, src, n: int):
    """vectors: list of length-n int lists (any residue class mod L);
    src: prepped source from prep_source.  One device launch (split along
    the vector axis when too wide for the VMEM lane pool — the degenerate
    huge-T hazard flagged by advisor r2 item 4)."""
    digit_blocks = [signed_digits([v % L for v in vec], C)
                    for vec in vectors]
    digits = np.concatenate(digit_blocks, axis=1)       # [n, k*W]
    return msm_many_digits_t(
        np.ascontiguousarray(digits.T, dtype=np.int8), src, n)


def max_stack_k() -> int:
    """Largest number of stacked scalar vectors whose combined launch keeps
    the bucket-lane pool under the VMEM cap (pool ~ k*W*NB lanes + slack <=
    _POOL_CAP for any table size: the count-mass term total/T ~ k*W*NB too
    once T tracks the mean).  Stacking beyond this forces the planner into
    a degenerate huge-T shape (advisor r2 item 4 — measured as a 27 GB
    allocation at k=12 over a 130-point table)."""
    k = 1
    while True:
        mb = (k + 1) * W * NB
        if mb + 512 + (mb >> 4) + 1 > _POOL_CAP:
            return k
        k += 1


def msm_many_digits_t(digits_t, src, n: int):
    """Window-major digit path: digits_t [k*W, n] int8, either a DEVICE
    array (kept resident: static-shape schedule built on device inside the
    MSM jit — zero plan readbacks; BPG_TPU_MSM_SCHED=readback restores the
    dynamic-shape [M+1]-readback path) or host numpy (C scheduler + idx
    upload).  Launches too wide for the VMEM lane pool split recursively
    along the vector axis."""
    wt = digits_t.shape[0]
    k = wt // W
    k_max = max_stack_k()
    if k > k_max:
        split = k_max * W
        return (msm_many_digits_t(digits_t[:split], src, n)
                + msm_many_digits_t(digits_t[split:], src, n))
    if isinstance(digits_t, jnp.ndarray) and not isinstance(
            digits_t, np.ndarray):
        if os.environ.get("BPG_TPU_MSM_SCHED", "static") == "readback":
            return _launch_device(build_schedule_device(digits_t, n), src, n)
        return _launch_static(digits_t, src, n)
    if os.environ.get("BPG_TPU_MSM_SCHED", "static") == "static":
        return _launch_static(jnp.asarray(
            np.ascontiguousarray(digits_t, dtype=np.int8)), src, n)
    return _launch(build_schedule_t(digits_t, n), src)


def msm(scalars, points) -> RistrettoPoint:
    """Host entry for arbitrary point sets (dynamic part of the verifier
    mega-MSM etc.): preps an affine source per call."""
    src, n = prep_source(points)
    return msm_many([[int(s) for s in scalars]], src, n)[0]


class GeneratorTable:
    """Device-resident prover/verifier MSM table over
    [G_0..G_{N-1} | H_0..H_{N-1} | B | B_blinding] (SURVEY.md §2.B
    "device-resident G/H arrays").  The affine source (with negations and
    identity slot) uploads once per proof size; every MSM against it is a
    scalar vector -> one schedule + one jit launch, several vectors batched
    into the same launch by stacking their digit windows."""

    __slots__ = ("N", "m", "src")
    supports_digits = True

    def __init__(self, G, H, B, B_blinding):
        self.N = len(G)
        assert len(H) == self.N
        self.m = 2 * self.N + 2
        self.src, _ = prep_source(list(G) + list(H) + [B, B_blinding])

    def msm_many(self, vectors):
        for v in vectors:
            assert len(v) == self.m, (len(v), self.m)
        return msm_many(vectors, self.src, self.m)

    def msm_digits(self, digits_t):
        """digits_t [k*W, m] int8, window-major — host numpy (C scheduler)
        or device array (device sort/schedule, digits never read back)."""
        return msm_many_digits_t(digits_t, self.src, self.m)

    def msm_digits_launch(self, digits_t):
        """Async dispatch (device digits, static scheduler only): returns
        pending state; finish with msm_digits_finish.  Callers must keep
        k <= max_stack_k()."""
        assert digits_t.shape[0] // W <= max_stack_k()
        return _launch_static_async(digits_t, self.src, self.m)

    @staticmethod
    def msm_digits_finish(pending):
        return _launch_static_finish(pending)

    def msm_digits_enc_launch(self, digits_t):
        """As msm_digits_launch, but the result points compress on device;
        finish with msm_digits_enc_finish -> list of 32-byte encodings."""
        assert digits_t.shape[0] // W <= max_stack_k()
        return _launch_static_enc_async(digits_t, self.src, self.m)

    @staticmethod
    def msm_digits_enc_finish(pending):
        return _launch_static_enc_finish(pending)
