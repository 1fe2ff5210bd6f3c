#!/usr/bin/env python
"""Cumulative stage attribution of one fused-IPA round at merkle shapes.

Times jitted prefixes of the merged round (fold+scalars+digits -> +sort ->
+schedule+bucket MSM -> +compress -> +fs) at the pre-fold (m = 2n+2) and
post-fold table sizes, so the per-round floor's components are measured
rather than guessed.  Usage: python scripts/probe_round_floor.py [lg_n ...]
(defaults: 15 and 11 — merkle's pre-/post-fold segments).
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def run(lg_n: int):
    from bulletproof_gadgets_tpu.core.gens import PedersenGens, \
        BulletproofGens
    from bulletproof_gadgets_tpu.core.scalar import L
    from bulletproof_gadgets_tpu.ops import msm_serial, flvec, ipa_fused
    from bulletproof_gadgets_tpu.ops.ipa_device import (round_masks, _fold,
                                                        _scalars_compact)
    from bulletproof_gadgets_tpu.ops.ristretto_device import compress_cols
    from bulletproof_gadgets_tpu.ops.fl import NW

    n = 1 << lg_n
    pc = PedersenGens.default()
    bp = BulletproofGens(n)
    table = msm_serial.GeneratorTable(list(bp.G(n)), list(bp.H(n)),
                                      pc.B, pc.B_blinding)
    m = table.m
    rng = np.random.default_rng(7)

    def rand_rows(k):
        return jnp.asarray(flvec.to_limbs(
            [int.from_bytes(rng.bytes(32), "little") % L for _ in range(k)]))

    a = rand_rows(n)
    b = rand_rows(n)
    gc = jnp.asarray(flvec.to_mont(
        [int.from_bytes(rng.bytes(32), "little") % L for _ in range(n)]))
    hc = jnp.asarray(flvec.to_mont(
        [int.from_bytes(rng.bytes(32), "little") % L for _ in range(n)]))
    wr2 = rand_rows(1)[0]
    u_m = jnp.asarray(flvec.to_mont([12345]))
    uinv_m = jnp.asarray(flvec.to_mont([pow(12345, L - 2, L)]))
    masks = round_masks(n)
    mk = masks[1]
    prev = masks[0]
    t_r, p, steps = msm_serial._static_plan(64, m, c=8, fill=0.5)
    print(f"lg_n={lg_n} m={m} plan=({t_r}, {p}, {steps})", flush=True)

    args = (a, b, gc, hc, u_m, uinv_m, wr2, prev["ga"], prev["hi"],
            mk["ga"], mk["hi"], mk["cs"], mk["lo_i"], mk["hi_i"],
            mk["tL"], mk["tH"], mk["remap"])

    @jax.jit
    def s_foldscal(a, b, gc, hc, u_m, uinv_m, wr2, pga, phi, ga, hi, cs,
                   lo_i, hi_i, tL, tH, remap):
        a, b, gc, hc = _fold(a, b, gc, hc, u_m, uinv_m, pga, phi)
        dig = _scalars_compact(a, b, gc, hc, wr2, ga, hi, cs, lo_i, hi_i,
                               tL, tH)
        return dig[:, :4]

    @jax.jit
    def s_sort(a, b, gc, hc, u_m, uinv_m, wr2, pga, phi, ga, hi, cs,
               lo_i, hi_i, tL, tH, remap):
        a, b, gc, hc = _fold(a, b, gc, hc, u_m, uinv_m, pga, phi)
        dig = _scalars_compact(a, b, gc, hc, wr2, ga, hi, cs, lo_i, hi_i,
                               tL, tH)
        nc = dig.shape[1]
        s0, e0, sv = msm_serial._entries_sorted_packed(dig, 64, nc, 128)
        return sv[:4]

    @jax.jit
    def s_msm(a, b, gc, hc, u_m, uinv_m, wr2, pga, phi, ga, hi, cs,
              lo_i, hi_i, tL, tH, remap):
        a, b, gc, hc = _fold(a, b, gc, hc, u_m, uinv_m, pga, phi)
        dig = _scalars_compact(a, b, gc, hc, wr2, ga, hi, cs, lo_i, hi_i,
                               tL, tH)
        nc = dig.shape[1]
        cols = msm_serial._msm_serial_static_remapped(
            dig, table.src, remap, 64, nc, t_r, p, 2, steps, 8)
        return cols[:, :2, :2]

    @jax.jit
    def s_compress(a, b, gc, hc, u_m, uinv_m, wr2, pga, phi, ga, hi, cs,
                   lo_i, hi_i, tL, tH, remap):
        a, b, gc, hc = _fold(a, b, gc, hc, u_m, uinv_m, pga, phi)
        dig = _scalars_compact(a, b, gc, hc, wr2, ga, hi, cs, lo_i, hi_i,
                               tL, tH)
        nc = dig.shape[1]
        cols = msm_serial._msm_serial_static_remapped(
            dig, table.src, remap, 64, nc, t_r, p, 2, steps, 8)
        return compress_cols(cols[:, :, :2])

    # full merged round (msm + fs in one dispatch): use the real jit
    meta = (64, 60, 7)
    merged = ipa_fused._get_merged_jit(meta, m, t_r, p, steps, 8)
    state = jnp.zeros((200,), jnp.int32)

    stages = [("foldscal+digits", s_foldscal, args),
              ("+entry sort", s_sort, args),
              ("+sched+bucket+horner", s_msm, args),
              ("+compress", s_compress, args)]
    for tag, fn, aa in stages:
        r = fn(*aa)
        np.asarray(r)
        t0 = time.perf_counter()
        iters = 5
        outs = [fn(*aa) for _ in range(iters)]
        for o in outs:
            np.asarray(o)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"  {tag:24s} {dt:7.1f} ms", flush=True)

    r = merged(state, *args)
    np.asarray(r[0])
    t0 = time.perf_counter()
    iters = 5
    outs = [merged(state, *args) for _ in range(iters)]
    for o in outs:
        np.asarray(o[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"  {'full merged round':24s} {dt:7.1f} ms", flush=True)


if __name__ == "__main__":
    for lg in [int(x) for x in sys.argv[1:]] or [15, 11]:
        run(lg)
