"""Pippenger multiscalar multiplication on TPU.

Data-parallel formulation (no scatter, no data-dependent control flow — all
XLA-friendly primitives):

  1. Host: signed digit recoding of scalars, window width c
     (digits in [-2^(c-1), 2^(c-1)], numpy-vectorized).
  2. Device, per window:  negate points with negative digits (complete
     formula, branchless select) -> sort by |digit| (argsort + gather) ->
     inclusive prefix scan with the unified group law -> bucket sums as
     prefix differences at bucket boundaries (searchsorted) -> Σ b·S_b via
     two more point scans.
  3. Host: Horner combine of the ~20-30 window sums (c doublings each).

Prefix scans are Hillis-Steele passes driven by lax.fori_loop: the
point-addition body appears ONCE per scan in the traced graph (a
lax.associative_scan would inline it 2·log2(n) times, which makes XLA
compile times explode).  Work is n·log n adds per scan — the round-2
optimization is a blocked two-level scan to approach 2n.

Chunking over the point axis (each chunk yields per-window partial sums,
summed pointwise) doubles as the multi-device decomposition: shard = chunk,
psum over partials (see parallel/sharded_msm.py).

This pipeline plays the role of dalek's AVX2 backend + Pippenger loop
(SURVEY.md §2.B) and is the framework's headline benchmark.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import curve
from ..core.scalar import L
from ..core.ristretto import RistrettoPoint


def choose_c(n: int) -> int:
    # Byte-aligned windows so digit extraction is a numpy view.  c=8 wins for
    # every practical size with scan-based bucket aggregation: its bucket
    # stage costs 3*128*log(128) point-ops per window vs 3*2^15*15 for c=16,
    # which dwarfs the halved window count (measured crossover > 2^20).
    return 8


def signed_digits(scalars, c: int) -> np.ndarray:
    """[n] ints (already reduced mod L) -> [n, windows] int32 signed digits,
    value = sum digits[i] * 2^(c*i).  c must be 8 or 16."""
    n = len(scalars)
    raw = b"".join(s.to_bytes(32, "little") for s in scalars)
    if c == 8:
        digits = np.frombuffer(raw, dtype=np.uint8).reshape(n, 32)
    elif c == 16:
        digits = np.frombuffer(raw, dtype="<u2").reshape(n, 16)
    else:
        raise ValueError("c must be 8 or 16")
    digits = digits.astype(np.int32)
    # signed recoding: digit >= 2^(c-1) -> digit - 2^c, carry into next
    half = 1 << (c - 1)
    carry = np.zeros(n, dtype=np.int32)
    for w in range(digits.shape[1]):
        d = digits[:, w] + carry
        carry = (d >= half).astype(np.int32)
        digits[:, w] = d - (carry << c)
    # scalars < L < 2^253, so the top window absorbs any carry
    assert not carry.any(), "scalar overflow in signed recoding"
    return digits


def _prefix_scan(pts):
    """Inclusive prefix scan of points along axis 0 (Hillis-Steele;
    one padd body in the graph, ceil(log2 n) iterations at runtime)."""
    n = pts[0].shape[0]
    if n == 1:
        return pts
    log_n = (n - 1).bit_length()
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    ident = curve.identity((n,))

    def body(s, x):
        shift = jnp.int32(1) << s
        shifted = tuple(jnp.roll(leaf, shift, axis=0) for leaf in x)
        addend = curve.pselect(idx >= shift, shifted, ident)
        return curve.padd(x, addend)

    return jax.lax.fori_loop(0, log_n, body, pts)


@partial(jax.jit, static_argnums=(2,))
def _msm_window_sums(digits, points, c: int):
    """digits: [n, windows] int32; points: pytree of [n, NL].

    Returns pytree of [windows, NL]: per-window sums Σ_i d_iw * P_i.
    """
    n, windows = digits.shape
    num_buckets = (1 << (c - 1)) + 1  # ids 0..2^(c-1); 0 = no-op bucket

    neg = curve.pneg(points)

    def one_window(d):
        keys = jnp.abs(d)
        pts = curve.pselect(d < 0, neg, points)
        # zero-digit entries become the identity so they vanish in the sums
        pts = curve.pselect(keys == 0, curve.identity((n,)), pts)
        order = jnp.argsort(keys)
        keys_s = keys[order]
        pts_s = tuple(x[order] for x in pts)
        prefix = _prefix_scan(pts_s)
        # counts[b] = #elements with key <= b
        bvals = jnp.arange(num_buckets, dtype=keys_s.dtype)
        counts = jnp.searchsorted(keys_s, bvals, side="right")
        ident1 = curve.identity((1,))
        prefix_ext = tuple(jnp.concatenate([i1, pr], axis=0)
                           for i1, pr in zip(ident1, prefix))
        ends = tuple(x[counts] for x in prefix_ext)      # [num_buckets]
        starts = tuple(x[:-1] for x in ends)
        stops = tuple(x[1:] for x in ends)
        buckets = curve.padd(stops, curve.pneg(starts))  # S_1..S_max
        # Σ b*S_b = Σ_k (prefix of reversed S)[k]
        rev = tuple(x[::-1] for x in buckets)
        suffix = _prefix_scan(rev)
        total = _prefix_scan(suffix)
        return tuple(x[-1] for x in total)

    return jax.vmap(one_window, in_axes=1, out_axes=0)(digits)


def window_sums(digits: np.ndarray, points_dev, c: int,
                chunk: int = 1 << 17):
    """Chunked window sums; returns pytree [windows, NL] on device."""
    n = digits.shape[0]
    if n <= chunk:
        return _msm_window_sums(jnp.asarray(digits), points_dev, c)
    acc = None
    for lo in range(0, n, chunk):
        hi = min(n, lo + chunk)
        part = _msm_window_sums(
            jnp.asarray(digits[lo:hi]),
            tuple(x[lo:hi] for x in points_dev), c)
        acc = part if acc is None else curve.padd(acc, part)
    return acc


def horner_combine(window_pts, c: int) -> RistrettoPoint:
    """Host combine: Σ_w 2^(cw) W_w via doubling Horner (tiny)."""
    pts = curve.points_from_device(window_pts)
    acc = RistrettoPoint.identity()
    for wp in reversed(pts):
        for _ in range(c):
            acc = acc.double()
        acc = acc + wp
    return acc


def msm(scalars, points) -> RistrettoPoint:
    """Backend entry: scalars list[int], points list[RistrettoPoint]."""
    ks = [k % L for k in scalars]
    c = choose_c(len(ks))
    digits = signed_digits(ks, c)
    points_dev = curve.points_to_device(points)
    wsums = window_sums(digits, points_dev, c)
    return horner_combine(wsums, c)
