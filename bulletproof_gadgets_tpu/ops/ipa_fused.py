"""Fully-device inner-product argument: MSM + compress + Fiat-Shamir fold
with device state, ZERO per-round host round trips.

Round 3's device IPA (ops/ipa_device.py) kept the coefficient vectors on
the TPU but still synced every round: the L/R MSM result came back to the
host to be compressed and absorbed into the Merlin transcript, and the
challenge went back up — lg(n) blocking tunnel round trips per prove
(~45% of a warm merkle prove; docs/PERFORMANCE.md round-4 queue #1).

Here the transcript STATE lives on device (ops/strobe_device; byte
positions are trace-time static), points are compressed on device
(ops/ristretto_device), and the challenge + its inverse are derived on
device, so each round is dispatch-only.  The Python loop dispatches all
lg(n) rounds back-to-back and pays a single readback at the end for the
L/R encodings, the final a/b, and the static-plan overflow flags.  On
(rare) tight-plan pool overflow the whole argument re-runs on the safe
shape.

Each round is TWO dispatches: the heavy fold+scalars+MSM+compress graph
is independent of the transcript byte position, so it compiles once per
circuit SIZE, while the tiny absorb+challenge+invert graph is specialized
to the strobe meta (which varies per statement on round 1 and is the
constant (64, 60, 7) from round 2 on).  A single fused graph would
recompile the multi-minute MSM pipeline for every statement.

Byte/transcript output is identical to the host path (oracle:
tests/test_ipa_fused.py vs core/ipa.py's host implementation).

Role in the reference stack: dalek inner_product_proof.rs `create`
(invoked from prover.prove, /root/reference/src/prove.rs:79).
"""
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import flvec, msm_serial, ipa_fold
from .fl import mont_mul, NW, R as _R
from .ipa_device import (round_masks, _fold, _scalars, _scalars13,
                         _scalars_compact)
from .strobe_device import DeviceStrobe, snapshot_host
from .ristretto_device import (compress_cols, challenge_limbs, to_mont_dev,
                               inv_mont)
from ..core.scalar import L

_W = msm_serial.W          # 32 windows
_NL = msm_serial.NL

# window width for the per-round L/R MSM: c=13 (limb-width digits, 20
# windows) cuts bucket-stage slots ~1.2-1.5x, but its weighted bucket
# reduction runs masked scans over a 20x taller lane array (2*log2(4096)
# steps x 81920 lanes per vector ~ 2-4M lane-padds), which MEASURED 2.5x
# slower end-to-end at a 2^17-gens table (9.0s vs 3.6s warm merkle).
# The slot model crosses over only around 2^20 table points, so c=13 is
# gated far out; BPG_TPU_IPA_C overrides for experiments.
_C_ENV = os.environ.get("BPG_TPU_IPA_C")
_C_MIN_M = 1 << 21
# the L/R vectors are half structural zeros (each table point is in
# exactly one of L, R per round)
_FILL = 0.5


def _ipa_c(m: int) -> int:
    if _C_ENV:
        return int(_C_ENV)
    return 13 if m >= _C_MIN_M else 8


def _round_msm(a, b, gc, hc, u_m, uinv_m, wr2, src,
               prev_ga, prev_hi, ga, hi, cs, lo_i, hi_i, tL, tH, remap,
               *, first: bool, n: int, t_rounds: int, p: int,
               merge_steps: int, c: int):
    """Fold (from round 2) + L/R MSM + device compression.  Independent of
    the transcript state -> one compile per circuit size.

    c=8 uses the COMPACT layout: the L/R vectors are complementary halves
    of the table, so digits/sort run over n/2+1 columns per vector with a
    post-sort source remap (halves the entry sort — the second-largest
    per-round cost)."""
    if not first:
        a, b, gc, hc = _fold(a, b, gc, hc, u_m, uinv_m, prev_ga, prev_hi)
    w = msm_serial._WIN[c][2]
    if c == 8:
        dig = _scalars_compact(a, b, gc, hc, wr2, ga, hi, cs, lo_i, hi_i,
                               tL, tH)                     # [64, n/2+1]
        cols = msm_serial._msm_serial_static_remapped(
            dig, src, remap, 2 * w, n // 2, t_rounds, p, 2,
            merge_steps, c)
    else:
        dig = _scalars13(a, b, gc, hc, wr2, ga, hi, cs, lo_i, hi_i)
        cols = msm_serial._msm_serial_static(
            dig, src, 2 * w, n, t_rounds, p, 2, merge_steps, c)
    pool = cols[0, 0, 2]
    enc = compress_cols(cols[:, :, :2])                        # [2, 32]
    return a, b, gc, hc, enc, pool


def _round_foldscal(a, b, gc, hc, u_m, uinv_m, wr2,
                    prev_ga, prev_hi, ga, hi, cs, lo_i, hi_i,
                    *, first: bool):
    """Chunked-table variant, part 1: fold + dense scalar digits."""
    if not first:
        a, b, gc, hc = _fold(a, b, gc, hc, u_m, uinv_m, prev_ga, prev_hi)
    dig = _scalars(a, b, gc, hc, wr2, ga, hi, cs, lo_i, hi_i)  # [64, m]
    return a, b, gc, hc, dig


def _round_combine(stacked, pools, *, c: int):
    """Chunked-table variant, part 3: group-law combine of per-chunk
    window sums + Horner + compression."""
    cur = tuple(stacked[0, i] for i in range(4))
    from .pallas_curve import padd_cols
    for d in range(1, stacked.shape[0]):
        cur = padd_cols(cur, tuple(stacked[d, i] for i in range(4)))
    cols = msm_serial._horner_part(cur, 2, c)
    enc = compress_cols(cols)
    return enc, pools


def _round_fs(state, enc, *, meta):
    """Absorb L/R + derive u, u^-1 (mont).  Tiny graph, specialized to the
    strobe meta."""
    ds = DeviceStrobe(state, *meta)
    ds.append_message(b"L", enc[0])
    ds.append_message(b"R", enc[1])
    u64 = ds.challenge_bytes(b"u", 64)
    u_std = challenge_limbs(u64)
    u_m = to_mont_dev(u_std[None, :])[0]
    uinv_m = inv_mont(u_std)
    return ds.state, u_m[None, :], uinv_m[None, :], ds.meta


_jit_cache = {}


def _round_merged(state, a, b, gc, hc, u_m, uinv_m, wr2, src,
                  prev_ga, prev_hi, ga, hi, cs, lo_i, hi_i, tL, tH, remap,
                  *, meta, n: int, t_rounds: int, p: int,
                  merge_steps: int, c: int):
    """MSM + transcript step in ONE dispatch — used from round 1 on, where
    the strobe meta is the constant steady state (a PRF always ends at
    pos 64), so this big graph compiles once per circuit SIZE.  Round 0's
    meta varies per statement and keeps the split two-dispatch form (its
    transcript half is a tiny per-statement compile)."""
    a, b, gc, hc, enc, pool = _round_msm(
        a, b, gc, hc, u_m, uinv_m, wr2, src, prev_ga, prev_hi,
        ga, hi, cs, lo_i, hi_i, tL, tH, remap,
        first=False, n=n, t_rounds=t_rounds, p=p,
        merge_steps=merge_steps, c=c)
    state, u_m2, uinv_m2, _ = _round_fs(state, enc, meta=meta)
    return state, a, b, gc, hc, u_m2, uinv_m2, enc, pool


def _get_merged_jit(meta, n, t_rounds, p, merge_steps, c):
    key = ("merged", meta, n, t_rounds, p, merge_steps, c)
    fn = _jit_cache.get(key)
    if fn is None:
        fn = jax.jit(partial(_round_merged, meta=meta, n=n,
                             t_rounds=t_rounds, p=p,
                             merge_steps=merge_steps, c=c))
        _jit_cache[key] = fn
    return fn


def _get_msm_jit(first, n, t_rounds, p, merge_steps, c):
    key = ("msm", first, n, t_rounds, p, merge_steps, c)
    fn = _jit_cache.get(key)
    if fn is None:
        fn = jax.jit(partial(_round_msm, first=first, n=n,
                             t_rounds=t_rounds, p=p,
                             merge_steps=merge_steps, c=c))
        _jit_cache[key] = fn
    return fn


def _get_foldscal_jit(first):
    key = ("foldscal", first)
    fn = _jit_cache.get(key)
    if fn is None:
        fn = jax.jit(partial(_round_foldscal, first=first))
        _jit_cache[key] = fn
    return fn


def _get_combine_jit(c):
    key = ("combine", c)
    fn = _jit_cache.get(key)
    if fn is None:
        fn = jax.jit(partial(_round_combine, c=c))
        _jit_cache[key] = fn
    return fn


def _get_fs_jit(meta):
    key = ("fs", meta)
    fn = _jit_cache.get(key)
    if fn is None:
        base = partial(_round_fs, meta=meta)

        def wrapped(state, enc):
            out = base(state, enc)
            return out[:-1]                    # meta is static, not traced

        # derive the static out-meta once (pure-Python pos tracking)
        probe = DeviceStrobe(jnp.zeros((200,), jnp.int32), *meta)
        probe.append_message(b"L", jnp.zeros((32,), jnp.int32))
        probe.append_message(b"R", jnp.zeros((32,), jnp.int32))
        probe.challenge_bytes(b"u", 64)
        fn = (jax.jit(wrapped), probe.meta)
        _jit_cache[key] = fn
    return fn


@jax.jit
def _final_fold_pack(a, b, gc, hc, u_m, uinv_m, ga, hi, Ls, Rs, pools):
    a, b, gc, hc = _fold(a, b, gc, hc, u_m, uinv_m, ga, hi)
    flat = jnp.concatenate([
        Ls.reshape(-1), Rs.reshape(-1), a[0], b[0],
        pools.reshape(-1)]).astype(jnp.int32)
    return flat


def create(transcript, table, w_scalar, G_factors, H_factors, a, b,
           replay_host: bool = True):
    """Full IPA with device transcript.  Same contract as
    ipa_device.create: returns (L_vec, R_vec, a0, b0); `transcript` is the
    HOST transcript positioned right after the ipp domain separator — its
    state is snapshotted to device, and (by default) the L/R absorbs +
    challenges are replayed into it afterwards so the host object stays
    consistent for callers that continue using it."""
    if isinstance(a, list):
        a = jnp.asarray(flvec.to_limbs([s % L for s in a]))
    if isinstance(b, list):
        b = jnp.asarray(flvec.to_limbs([s % L for s in b]))
    n_full = a.shape[0]
    assert table.N == n_full
    m = 2 * n_full + 2
    masks = round_masks(n_full)
    lg_n = len(masks)

    gc = jnp.asarray(flvec.to_mont([s % L for s in G_factors]))
    hc = jnp.asarray(flvec.to_mont([s % L for s in H_factors]))
    wr2 = jnp.asarray(flvec.to_limbs([w_scalar * _R * _R % L]))[0]

    st0, pos, pb, cf = snapshot_host(transcript)

    c = _ipa_c(m)
    w = msm_serial._WIN[c][2]
    fold_on, fold_at, fold_min = ipa_fold.fold_params()
    fold_on = fold_on and c == 8
    for safe in (False, True):
        state = jnp.asarray(st0)
        meta = (pos, pb, cf)
        a_d, b_d, gc_d, hc_d = a, b, gc, hc
        u_m = jnp.zeros((1, NW), jnp.int32)
        uinv_m = jnp.zeros((1, NW), jnp.int32)
        Ls, Rs, pools, caps = [], [], [], []
        src_cur = table.src
        n_seg = n_full                # table G-vector length, this segment
        m_cur = m
        masks_cur = masks
        local = 0                     # rounds since segment start
        seg_plan = None
        for rnd in range(lg_n):
            if (fold_on and local == fold_at
                    and (n_seg >> fold_at) >= fold_min
                    and (lg_n - rnd) >= 4):
                # materialize the folded table: apply the pending challenge
                # fold, collapse the coefficients into real points, restart
                # the segment 2^fold_at smaller (ops/ipa_fold).
                if os.environ.get("BPG_TPU_IPA_DEBUG"):
                    import sys as _sys
                    import time as _time
                    jax.block_until_ready(state)
                    _t0 = _time.perf_counter()
                    print(f"ipa_fused: fold at rnd {rnd} n_seg {n_seg}",
                          file=_sys.stderr, flush=True)
                prevm = masks_cur[local - 1]
                a_d, b_d, gc_d, hc_d = _fold(
                    a_d, b_d, gc_d, hc_d, u_m, uinv_m,
                    prevm["ga"], prevm["hi"])
                src_cur = ipa_fold.materialize(
                    src_cur, gc_d, hc_d, n_seg, fold_at, m_cur)
                n_seg >>= fold_at
                m_cur = 2 * n_seg + 2
                a_d = a_d[:n_seg]
                b_d = b_d[:n_seg]
                onem = jnp.broadcast_to(
                    jnp.asarray(flvec.to_mont([1]))[0], (n_seg, NW))
                gc_d = onem
                hc_d = onem
                masks_cur = round_masks(n_seg)
                local = 0
                seg_plan = None
                if os.environ.get("BPG_TPU_IPA_DEBUG"):
                    jax.block_until_ready(src_cur)
                    print(f"ipa_fused: fold done in "
                          f"{_time.perf_counter() - _t0:.3f}s -> n {n_seg}",
                          file=_sys.stderr, flush=True)
            mk = masks_cur[local]
            prev = masks_cur[local - 1] if local else mk
            if seg_plan is None:
                if m_cur > msm_serial._POINT_CHUNK and c == 8:
                    slabs = [msm_serial._chunk_src(src_cur, m_cur, lo)
                             for lo, _, _, _, _ in msm_serial._chunk_plans(
                                 2 * w, m_cur, c)]
                    cplans = msm_serial._chunk_plans(2 * w, m_cur, c,
                                                     safe=safe)
                    if not safe:
                        cplans = [(lo, h) + msm_serial._static_plan(
                            2 * w, h, c=c, fill=_FILL)
                            for lo, h, _, _, _ in cplans]
                    seg_plan = ("chunk", cplans, slabs)
                else:
                    seg_plan = ("plain",) + msm_serial._static_plan(
                        2 * w, m_cur, safe=safe, c=c, fill=_FILL)
            if seg_plan[0] == "chunk":
                _, cplans, slabs = seg_plan
                fsc = _get_foldscal_jit(local == 0)
                a_d, b_d, gc_d, hc_d, dig = fsc(
                    a_d, b_d, gc_d, hc_d, u_m, uinv_m, wr2,
                    prev["ga"], prev["hi"], mk["ga"], mk["hi"], mk["cs"],
                    mk["lo_i"], mk["hi_i"])
                wss, pls = [], []
                for (lo, h, ct, cp, csteps), slab in zip(cplans, slabs):
                    ws_c, pool_c = msm_serial._msm_serial_static_ws(
                        jax.lax.dynamic_slice_in_dim(dig, lo, h, 1),
                        slab, 2 * w, h, ct, cp, 2, csteps, c)
                    wss.append(ws_c)
                    pls.append(pool_c)
                enc, pool = _get_combine_jit(c)(
                    jnp.stack(wss), jnp.stack(pls))
                pools.append(pool.reshape(-1))
                caps.extend(pl[3] for pl in cplans)
            elif local > 0:
                # steady-state rounds: MSM + transcript in one dispatch
                # (meta is constant from round 1 on -> one compile/size)
                _, t_r, p, steps = seg_plan
                merged = _get_merged_jit(meta, m_cur, t_r, p, steps, c)
                (state, a_d, b_d, gc_d, hc_d, u_m, uinv_m, enc,
                 pool) = merged(
                    state, a_d, b_d, gc_d, hc_d, u_m, uinv_m, wr2,
                    src_cur, prev["ga"], prev["hi"], mk["ga"], mk["hi"],
                    mk["cs"], mk["lo_i"], mk["hi_i"], mk["tL"], mk["tH"],
                    mk["remap"])
                Ls.append(enc[0])
                Rs.append(enc[1])
                pools.append(pool.reshape(1))
                caps.append(p)
                local += 1
                if os.environ.get("BPG_TPU_IPA_DEBUG"):
                    import sys as _sys2
                    import time as _time2
                    _tr = _time2.perf_counter()
                    jax.block_until_ready(state)
                    print(f"ipa_fused: rnd {rnd} (m {m_cur}) sync "
                          f"{_time2.perf_counter() - _tr:.3f}s",
                          file=_sys2.stderr, flush=True)
                continue
            else:
                _, t_r, p, steps = seg_plan
                msm_fn = _get_msm_jit(True, m_cur, t_r, p, steps, c)
                (a_d, b_d, gc_d, hc_d, enc, pool) = msm_fn(
                    a_d, b_d, gc_d, hc_d, u_m, uinv_m, wr2, src_cur,
                    prev["ga"], prev["hi"], mk["ga"], mk["hi"], mk["cs"],
                    mk["lo_i"], mk["hi_i"], mk["tL"], mk["tH"],
                    mk["remap"])
                pools.append(pool.reshape(1))
                caps.append(p)
            fs_fn, out_meta = _get_fs_jit(meta)
            state, u_m, uinv_m = fs_fn(state, enc)
            meta = out_meta
            Ls.append(enc[0])
            Rs.append(enc[1])
            local += 1
            if os.environ.get("BPG_TPU_IPA_DEBUG"):
                import sys as _sys2
                import time as _time2
                _tr = _time2.perf_counter()
                jax.block_until_ready(state)
                print(f"ipa_fused: rnd {rnd} (m {m_cur}) sync "
                      f"{_time2.perf_counter() - _tr:.3f}s",
                      file=_sys2.stderr, flush=True)
        flat = _final_fold_pack(a_d, b_d, gc_d, hc_d, u_m, uinv_m,
                                masks_cur[-1]["ga"], masks_cur[-1]["hi"],
                                jnp.stack(Ls), jnp.stack(Rs),
                                jnp.concatenate(pools))
        out = np.asarray(flat)                  # THE one readback
        pools_np = out[2 * 32 * lg_n + 2 * NW:]
        caps_np = np.asarray(caps)
        if (pools_np < caps_np).all():
            break
        # tight-plan overflow: redo on the safe shape (recompiles once)
        import sys
        print(f"ipa_fused: tight-plan pool overflow "
              f"(max {int(pools_np.max())}), re-running safe",
              file=sys.stderr, flush=True)

    L_vec = [bytes(out[32 * i:32 * i + 32].astype(np.uint8))
             for i in range(lg_n)]
    off = 32 * lg_n
    R_vec = [bytes(out[off + 32 * i:off + 32 * i + 32].astype(np.uint8))
             for i in range(lg_n)]
    off = 64 * lg_n
    a0, b0 = flvec.limbs_to_ints(out[off:off + 2 * NW].reshape(2, NW))

    if replay_host:
        for Lb, Rb in zip(L_vec, R_vec):
            transcript.append_message(b"L", Lb)
            transcript.append_message(b"R", Rb)
            transcript.challenge_bytes(b"u", 64)
    return L_vec, R_vec, a0, b0


# ---------------------------------------------------------------------------
# Cross-proof batched rounds (the DP serving shape)
#
# Small-circuit batched proving is DISPATCH-bound after round 4 (~22
# launches x ~10 ms tunnel RT per proof; bench_batch 0.36 s/witness on a
# 1.5k-multiplier circuit).  Proofs of the same circuit run their IPAs in
# lockstep here: each round stacks the group's L/R compact digit matrices
# into ONE MSM launch (k = 2*B vectors against the shared table, capped by
# msm_serial.max_stack_k) and runs the transcript step vmapped over the
# [B, 200] strobe states (entry byte positions are identical across
# proofs of one statement, so the static-position trick still holds).
# Dispatches per round drop from 2B to 2*ceil(2B / k_cap).

def _get_msm_jit_b(first, n, t_rounds, p, merge_steps, b):
    key = ("msmb", first, n, t_rounds, p, merge_steps, b)
    fn = _jit_cache.get(key)
    if fn is None:
        base = partial(_round_msm_batched, first=first, n=n,
                       t_rounds=t_rounds, p=p, merge_steps=merge_steps,
                       b=b)
        fn = jax.jit(base)
        _jit_cache[key] = fn
    return fn


def _round_msm_batched(a, b_, gc, hc, u_m, uinv_m, wr2, src,
                       prev_ga, prev_hi, ga, hi, cs, lo_i, hi_i, tL, tH,
                       remap, *, first: bool, n: int, t_rounds: int,
                       p: int, merge_steps: int, b: int):
    """Batched fold + stacked L/R MSM + compression.  Leading axis B on
    a/b_/gc/hc/u_m/uinv_m/wr2; masks shared."""
    if not first:
        fold_b = jax.vmap(_fold, in_axes=(0, 0, 0, 0, 0, 0, None, None))
        a, b_, gc, hc = fold_b(a, b_, gc, hc, u_m, uinv_m, prev_ga,
                               prev_hi)
    scal_b = jax.vmap(_scalars_compact,
                      in_axes=(0, 0, 0, 0, 0) + (None,) * 7)
    dig = scal_b(a, b_, gc, hc, wr2, ga, hi, cs, lo_i, hi_i, tL, tH)
    nc = dig.shape[2]
    dig = dig.reshape(b * 2 * _W, nc)          # [B*64, n/2] stacked
    remap_b = jnp.tile(remap, (b, 1))          # [2B, 2n+1]
    cols = msm_serial._msm_serial_static_remapped(
        dig, src, remap_b, 2 * b * _W, nc, t_rounds, p, 2 * b,
        merge_steps, 8)                        # [4, NL, 2B+1]
    pool = cols[0, 0, 2 * b]
    enc = compress_cols(cols[:, :, :2 * b])    # [2B, 32]
    return a, b_, gc, hc, enc.reshape(b, 2, 32), pool


def create_batched(transcripts, table, w_scalars, G_factors_list,
                   H_factors_list, a_list, b_list):
    """Fused IPA over a GROUP of proofs of the same circuit.  Inputs are
    per-proof lists (w, G_factors, H_factors, a, b as int lists or device
    rows); returns [(L_vec, R_vec, a0, b0)] per proof.  Host transcripts
    are replayed at the end (same contract as create)."""
    B = len(transcripts)
    assert B >= 1
    if B == 1 or table.m > msm_serial._POINT_CHUNK:
        # chunked tables already amortize dispatches internally
        return [create(t, table, w, gf, hf, av, bv)
                for t, w, gf, hf, av, bv in zip(
                    transcripts, w_scalars, G_factors_list,
                    H_factors_list, a_list, b_list)]
    k_cap = max(1, msm_serial.max_stack_k() // 2)
    if B > k_cap:
        out = []
        for i in range(0, B, k_cap):
            out.extend(create_batched(
                transcripts[i:i + k_cap], table, w_scalars[i:i + k_cap],
                G_factors_list[i:i + k_cap], H_factors_list[i:i + k_cap],
                a_list[i:i + k_cap], b_list[i:i + k_cap]))
        return out

    def rows(v):
        if isinstance(v, list):
            return jnp.asarray(flvec.to_limbs([s % L for s in v]))
        return v

    a = jnp.stack([rows(v) for v in a_list])
    b_ = jnp.stack([rows(v) for v in b_list])
    n_full = a.shape[1]
    assert table.N == n_full
    m = 2 * n_full + 2
    masks = round_masks(n_full)
    lg_n = len(masks)
    gc = jnp.stack([jnp.asarray(flvec.to_mont([s % L for s in gf]))
                    for gf in G_factors_list])
    hc = jnp.stack([jnp.asarray(flvec.to_mont([s % L for s in hf]))
                    for hf in H_factors_list])
    wr2 = jnp.stack([jnp.asarray(flvec.to_limbs(
        [w * _R * _R % L]))[0] for w in w_scalars])

    snaps = [snapshot_host(t) for t in transcripts]
    if len({s[1:] for s in snaps}) != 1:
        # The caller groups by MSM table only (lang/batch), so witnesses
        # that share a padded table but differ in commitment count reach
        # here with different transcript byte positions.  Degrade by
        # partitioning into meta-uniform subgroups instead of crashing.
        groups = {}
        for i, s in enumerate(snaps):
            groups.setdefault(s[1:], []).append(i)
        out = [None] * B
        for idxs in groups.values():
            sub = create_batched(
                [transcripts[i] for i in idxs], table,
                [w_scalars[i] for i in idxs],
                [G_factors_list[i] for i in idxs],
                [H_factors_list[i] for i in idxs],
                [a_list[i] for i in idxs], [b_list[i] for i in idxs])
            for i, r in zip(idxs, sub):
                out[i] = r
        return out
    st0 = np.stack([s[0] for s in snaps])
    pos, pb, cf = snaps[0][1:]

    for safe in (False, True):
        # the stacked launch sees B interleaved half-zero vectors: same
        # per-vector fill as the single-proof compact layout
        t_r, p, steps = msm_serial._static_plan(
            2 * B * _W, m, safe=safe, c=8, fill=_FILL)
        state = jnp.asarray(st0)
        meta = (pos, pb, cf)
        a_d, b_d, gc_d, hc_d = a, b_, gc, hc
        u_m = jnp.zeros((B, 1, NW), jnp.int32)
        uinv_m = jnp.zeros((B, 1, NW), jnp.int32)
        Ls, Rs, pools = [], [], []
        for rnd, mk in enumerate(masks):
            prev = masks[rnd - 1] if rnd else mk
            msm_fn = _get_msm_jit_b(rnd == 0, m, t_r, p, steps, B)
            (a_d, b_d, gc_d, hc_d, enc, pool) = msm_fn(
                a_d, b_d, gc_d, hc_d, u_m, uinv_m, wr2, table.src,
                prev["ga"], prev["hi"], mk["ga"], mk["hi"], mk["cs"],
                mk["lo_i"], mk["hi_i"], mk["tL"], mk["tH"], mk["remap"])
            fs_fn, out_meta = _get_fs_jit_b(meta, B)
            state, u_m, uinv_m = fs_fn(state, enc)
            meta = out_meta
            Ls.append(enc)
            Rs.append(enc)
            pools.append(pool)
        packs = []
        for i in range(B):
            packs.append(_final_fold_pack(
                a_d[i], b_d[i], gc_d[i], hc_d[i], u_m[i], uinv_m[i],
                masks[-1]["ga"], masks[-1]["hi"],
                jnp.stack([Ls[r][i, 0] for r in range(lg_n)]),
                jnp.stack([Rs[r][i, 1] for r in range(lg_n)]),
                jnp.stack([pools[r] for r in range(lg_n)])))
        outs = np.asarray(jnp.stack(packs))     # ONE readback for the group
        if all((o[2 * 32 * lg_n + 2 * NW:] < p).all() for o in outs):
            break

    results = []
    for i, out in enumerate(outs):
        L_vec = [bytes(out[32 * r:32 * r + 32].astype(np.uint8))
                 for r in range(lg_n)]
        off = 32 * lg_n
        R_vec = [bytes(out[off + 32 * r:off + 32 * r + 32].astype(np.uint8))
                 for r in range(lg_n)]
        off = 64 * lg_n
        a0, b0 = flvec.limbs_to_ints(out[off:off + 2 * NW].reshape(2, NW))
        t = transcripts[i]
        for Lb, Rb in zip(L_vec, R_vec):
            t.append_message(b"L", Lb)
            t.append_message(b"R", Rb)
            t.challenge_bytes(b"u", 64)
        results.append((L_vec, R_vec, a0, b0))
    return results


def _get_fs_jit_b(meta, b):
    key = ("fsb", meta, b)
    fn = _jit_cache.get(key)
    if fn is None:
        base = partial(_round_fs, meta=meta)

        def one(state, enc2):
            out = base(state, enc2)
            return out[:-1]

        probe = DeviceStrobe(jnp.zeros((200,), jnp.int32), *meta)
        probe.append_message(b"L", jnp.zeros((32,), jnp.int32))
        probe.append_message(b"R", jnp.zeros((32,), jnp.int32))
        probe.challenge_bytes(b"u", 64)
        fn = (jax.jit(jax.vmap(one)), probe.meta)
        _jit_cache[key] = fn
    return fn
