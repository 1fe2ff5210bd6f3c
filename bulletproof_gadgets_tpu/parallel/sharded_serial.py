"""Multi-device serial-bucket MSM: the real pipeline's TP/SP axis.

The generator table (the [G | H | B | B_blinding] affine source every
prover/verifier MSM rides, ops/msm_serial.GeneratorTable) is partitioned
by POINT across the mesh's "shard" axis.  Each device holds only its
contiguous slice of the source table and runs the full serial-bucket
pipeline (schedule gather -> bucket kernel -> merge -> weighted window
reduction) on its local points; the [NL, k*W] per-device window sums —
a few KB regardless of table size — are all-gathered over ICI and
tree-combined with the group law, then one device's Horner pass emits the
final points.  Window sums over disjoint point subsets combine exactly
(modular group law, no floats), so sharded proofs are byte-identical to
single-device proofs (asserted by __graft_entry__.dryrun_multichip and
tests/test_sharded_serial.py).

Scheduling is built per shard INSIDE the shard_map body (static (T, P)
from (kW, mloc) alone — ops/msm_serial._static_schedule), so all shards
execute one compiled SPMD shape with zero host planning; the round-3 host
scheduler (per-shard C passes + idx uploads, the +34% D=1 overhead of
SCALING.md §4) remains available via BPG_TPU_SHARD_SCHED=host.

Reference analogue: this partitions the MSM inside prover.prove /
verifier.verify (/root/reference/src/prove.rs:79, src/verify.rs:71) —
the reference is single-threaded; the decomposition is SURVEY.md §2.C's
TP row.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

import os

from ..ops import msm_serial
from ..ops.msm_serial import (
    Schedule, build_schedule_t, prep_source, _window_sums_part,
    _horner_part, _points_from_cols, _static_plan, _static_schedule,
    _ROUND_PAD, _LANE_PAD, NB, W, C)
from ..ops.pallas_curve import padd_cols
from ..ops.msm import signed_digits
from ..core.scalar import L


def _combine_ws(stacked):
    """[D, NL, kW] per-shard window sums (4-tuple) -> [NL, kW] totals,
    log2(D) padd steps (the shard axis folds into padd_cols lanes)."""
    d = stacked[0].shape[0]
    nl, kw = stacked[0].shape[1], stacked[0].shape[2]
    while d > 1:
        half = d // 2
        lo = tuple(x[:half].transpose(1, 0, 2).reshape(nl, half * kw)
                   for x in stacked)
        hi = tuple(x[half:2 * half].transpose(1, 0, 2).reshape(nl, half * kw)
                   for x in stacked)
        added = padd_cols(lo, hi)
        added = tuple(x.reshape(nl, half, kw).transpose(1, 0, 2)
                      for x in added)
        if d % 2:
            added = tuple(jnp.concatenate([a, x[2 * half:]], axis=0)
                          for a, x in zip(added, stacked))
            d = half + 1
        else:
            d = half
        stacked = added
    return tuple(x[0] for x in stacked)


class ShardedGeneratorTable:
    """Drop-in for msm_serial.GeneratorTable over a jax mesh with a "shard"
    axis.  Exposes the same msm_many / msm_digits interface, so the
    prover's A_I/A_O/S commitments, every IPA round's L/R pair, and the
    verifier mega-MSM shard transparently."""

    supports_digits = True

    def __init__(self, mesh, G, H, B, B_blinding):
        self.mesh = mesh
        self._fns = {}
        self.N = len(G)
        assert len(H) == self.N
        self.m = 2 * self.N + 2
        self.D = mesh.shape["shard"]
        self.mloc = -(-self.m // self.D)
        pts = list(G) + list(H) + [B, B_blinding]
        # pad entries never receive digit entries (digit columns are zero-
        # padded), any valid point works
        pts += [B] * (self.D * self.mloc - self.m)
        srcs = []
        for d in range(self.D):
            s, _ = prep_source(pts[d * self.mloc:(d + 1) * self.mloc])
            srcs.append(s)
        self.src_sharded = jax.device_put(
            jnp.stack(srcs),
            NamedSharding(mesh, P("shard", None, None)))

    # -- scheduling ---------------------------------------------------------
    def _schedules(self, digits_t: np.ndarray):
        """Split [kW, m] digits by point slice; equalize shapes across
        shards (max T, max P) so the shard_map body compiles once."""
        kw = digits_t.shape[0]
        pad_cols = self.D * self.mloc - self.m
        if pad_cols:
            digits_t = np.concatenate(
                [digits_t, np.zeros((kw, pad_cols), digits_t.dtype)], axis=1)
        slices = [np.ascontiguousarray(
            digits_t[:, d * self.mloc:(d + 1) * self.mloc])
            for d in range(self.D)]
        scheds = [build_schedule_t(s, self.mloc) for s in slices]
        t_max = max(s.idx.shape[0] for s in scheds)
        p_max = max(s.idx.shape[1] for s in scheds)
        if any(s.idx.shape != (t_max, p_max) for s in scheds):
            scheds = [build_schedule_t(s, self.mloc, force_t=t_max,
                                       force_p=p_max) for s in slices]
        merge_steps = max(s.merge_steps for s in scheds)
        return scheds, merge_steps

    # -- execution ----------------------------------------------------------
    def _sharded_fn(self, k: int, merge_steps: int):
        """Jitted shard_map body, cached per (k, merge_steps): without the
        jit wrapper, shard_map dispatches through its eager impl path and
        RE-TRACES + interprets the whole pipeline on every call (~40 s per
        MSM on the 8-device CPU mesh, warm == cold — the round-2 dryrun
        timeout's root cause).  jit compiles once per input shape."""
        key = (k, merge_steps)
        fn = self._fns.get(key)
        if fn is None:
            @partial(shard_map, mesh=self.mesh,
                     in_specs=(P("shard", None, None), P("shard", None),
                               P("shard", None), P("shard", None, None)),
                     out_specs=P(None, None, None),
                     check_rep=False)
            def f(idx_l, segid_l, lastp_l, src_l):
                ws = _window_sums_part(idx_l[0], segid_l[0], lastp_l[0],
                                       src_l[0], k, merge_steps)
                stacked = jnp.stack(ws)                       # [4, NL, kW]
                gathered = jax.lax.all_gather(stacked, "shard")  # [D, 4, …]
                parts = tuple(gathered[:, i] for i in range(4))
                total = _combine_ws(parts)
                return jnp.stack(total)                       # [4, NL, kW]

            # Horner runs OUTSIDE the shard_map in its own jit: it is
            # k-dependent only, so it compiles once per k instead of once
            # per (k, merge_steps) schedule shape.
            fn = (jax.jit(f), self._horner_fn(k))
            self._fns[key] = fn
        return fn

    def _horner_fn(self, k: int):
        fn = self._fns.get(("horner", k))
        if fn is None:
            fn = jax.jit(
                lambda tot: _horner_part(tuple(tot[i] for i in range(4)), k))
            self._fns[("horner", k)] = fn
        return fn

    def _run(self, scheds, merge_steps: int):
        k = scheds[0].k
        mesh = self.mesh
        idx = jax.device_put(
            jnp.stack([jnp.asarray(s.idx) for s in scheds]),
            NamedSharding(mesh, P("shard", None, None)))
        segid = jax.device_put(
            jnp.stack([jnp.asarray(s.segid) for s in scheds]),
            NamedSharding(mesh, P("shard", None)))
        lastp = jax.device_put(
            jnp.stack([jnp.asarray(s.last_pos) for s in scheds]),
            NamedSharding(mesh, P("shard", None)))
        ws_fn, horner_fn = self._sharded_fn(k, merge_steps)
        cols = horner_fn(ws_fn(idx, segid, lastp, self.src_sharded))
        return _points_from_cols(cols, k)

    # -- static in-jit scheduling (round 4) ---------------------------------
    # Round 3 built per-shard schedules on the HOST (two C passes + a
    # [T, P] idx upload per shard) while the single-device path had moved
    # fully on device — the +34% D=1 sharded overhead of SCALING.md §4.
    # Here each shard builds its own schedule INSIDE the shard_map body
    # via ops/msm_serial._static_schedule: (T, P) depends only on
    # (kW, mloc), so every shard compiles/executes the same static shape
    # (SPMD), and per-MSM host work drops to one sharded digit transfer.

    def _static_fn(self, kw: int, t: int, p: int, merge_steps: int):
        key = ("static", kw, t, p, merge_steps)
        fn = self._fns.get(key)
        if fn is None:
            k = kw // W
            mloc = self.mloc

            @partial(shard_map, mesh=self.mesh,
                     in_specs=(P(None, "shard"), P("shard", None, None)),
                     out_specs=(P(None, None, None), P()),
                     check_rep=False)
            def f(dig_l, src_l):
                idx, segid, lastp, pool = _static_schedule(
                    dig_l, kw, mloc, t, p)
                ws = _window_sums_part(idx, segid, lastp, src_l[0], k,
                                       merge_steps)
                stacked = jnp.stack(ws)                       # [4, NL, kW]
                gathered = jax.lax.all_gather(stacked, "shard")
                parts = tuple(gathered[:, i] for i in range(4))
                total = _combine_ws(parts)
                # Horner runs INSIDE the body, redundantly on every shard
                # (the window sums are replicated after the all_gather):
                # one dispatch + one readback per MSM instead of two — a
                # fixed per-MSM saving that shrinks the D=1 sharded
                # residual (VERDICT r4 item 6).
                cols = _horner_part(total, k)
                pool_max = jax.lax.pmax(pool, "shard")
                return cols, pool_max

            fn = jax.jit(f)
            self._fns[key] = fn
        return fn

    def _run_static(self, digits_t):
        kw = digits_t.shape[0]
        pad_cols = self.D * self.mloc - self.m
        if isinstance(digits_t, np.ndarray):
            if pad_cols:
                digits_t = np.concatenate(
                    [digits_t, np.zeros((kw, pad_cols), digits_t.dtype)],
                    axis=1)
            digits_t = jnp.asarray(digits_t)
        elif pad_cols:
            digits_t = jnp.pad(digits_t, ((0, 0), (0, pad_cols)))
        dig = jax.device_put(digits_t,
                             NamedSharding(self.mesh, P(None, "shard")))
        for safe in (False, True):
            t, p, steps = _static_plan(kw, self.mloc, safe=safe)
            ws_fn = self._static_fn(kw, t, p, steps)
            cols, pool = ws_fn(dig, self.src_sharded)
            if int(np.asarray(pool)) < p:
                break
        return _points_from_cols(cols, kw // W)

    # -- public API (GeneratorTable-compatible) ------------------------------
    def msm_digits(self, digits_t):
        if os.environ.get("BPG_TPU_SHARD_SCHED", "static") == "static":
            return self._run_static(digits_t)
        d = np.asarray(digits_t)
        scheds, merge_steps = self._schedules(d)
        return self._run(scheds, merge_steps)

    def msm_many(self, vectors):
        for v in vectors:
            assert len(v) == self.m, (len(v), self.m)
        blocks = [signed_digits([x % L for x in vec], C) for vec in vectors]
        digits = np.concatenate(blocks, axis=1)          # [m, k*W]
        return self.msm_digits(np.ascontiguousarray(digits.T, np.int8))
