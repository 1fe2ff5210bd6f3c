"""Multi-device Pippenger MSM via shard_map.

Decomposition: the point axis is sharded over the mesh's "shard" axis (the
same chunking the single-chip kernel uses, see ops/msm.py).  Every device
computes window sums for its local points; the per-window partial sums
(a few KB: windows x 4 coords x 20 limbs of int32) are all-gathered over ICI
and tree-combined with the group law on every device.  Communication is
O(windows) points regardless of n, so scaling efficiency is bounded by the
local kernel, not the collective.

Host-side Horner combine of the ~20-30 final window sums is unchanged.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import curve, msm as msm_ops, msm_cols
from ..ops.pallas_curve import to_cols
from ..core.scalar import L
from ..core.ristretto import RistrettoPoint


def _tree_combine(points_stack):
    """Combine [k, windows, NL] stacked partial sums with padd, log2(k)
    steps."""
    k = points_stack[0].shape[0]
    while k > 1:
        half = k // 2
        lo = tuple(x[:half] for x in points_stack)
        hi = tuple(x[half:2 * half] for x in points_stack)
        combined = curve.padd(lo, hi)
        if k % 2:
            combined = tuple(
                jnp.concatenate([c, x[2 * half:]], axis=0)
                for c, x in zip(combined, points_stack))
            k = half + 1
        else:
            k = half
        points_stack = combined
    return tuple(x[0] for x in points_stack)


_fn_cache = {}


def _sharded_fn(mesh, c: int):
    """Jitted shard_map window-sum body, cached per (mesh, c): without jit,
    shard_map re-traces and eagerly interprets every call (see
    parallel/sharded_serial.ShardedGeneratorTable._sharded_fn)."""
    key = (id(mesh), c)
    fn = _fn_cache.get(key)
    if fn is None:
        digit_spec = P("shard", None)
        point_spec = P(None, "shard")

        @partial(shard_map, mesh=mesh,
                 in_specs=(digit_spec, (point_spec,) * 4),
                 out_specs=(P(None, None),) * 4,
                 check_rep=False)
        def f(d, pts):
            local = msm_cols._window_sums_cols(d, pts, c)   # [W, NL] rows
            gathered = jax.lax.all_gather(local, "shard")  # [n_shard, W, NL]
            return _tree_combine(gathered)

        fn = jax.jit(f)
        if len(_fn_cache) > 8:
            _fn_cache.pop(next(iter(_fn_cache)))
        _fn_cache[key] = fn
    return fn


def sharded_window_sums(mesh, digits, points_dev, c: int):
    """digits: [n, windows] (replicated or host numpy); points_dev: pytree of
    [n, NL] device arrays.  n must divide evenly by the shard axis size.

    Returns pytree [windows, NL] (replicated)."""
    n_shard = mesh.shape["shard"]
    n = digits.shape[0]
    assert n % n_shard == 0, (n, n_shard)

    digit_spec = P("shard", None)
    point_spec = P(None, "shard")     # cols layout: lanes are sharded
    f = _sharded_fn(mesh, c)

    digits = jax.device_put(
        jnp.asarray(digits), NamedSharding(mesh, digit_spec))
    points_cols = to_cols(points_dev)
    points_cols = tuple(
        jax.device_put(x, NamedSharding(mesh, point_spec))
        for x in points_cols)
    return f(digits, points_cols)


def msm_sharded(mesh, scalars, points) -> RistrettoPoint:
    """Full sharded MSM from host data (pads n to a multiple of the shard
    count with zero scalars)."""
    ks = [k % L for k in scalars]
    n_shard = mesh.shape["shard"]
    pad = (-len(ks)) % n_shard
    if pad:
        ks = ks + [0] * pad
        points = list(points) + [points[0]] * pad
    c = msm_ops.choose_c(len(ks))
    digits = msm_ops.signed_digits(ks, c)
    points_dev = curve.points_to_device(points)
    wsums = sharded_window_sums(mesh, digits, points_dev, c)
    return msm_ops.horner_combine(wsums, c)
