import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from bulletproof_gadgets_tpu.core.gens import BulletproofGens
from bulletproof_gadgets_tpu.core.scalar import L
from bulletproof_gadgets_tpu.ops import msm_serial as ms
from bulletproof_gadgets_tpu.ops.msm import signed_digits

n = 1 << 18
gens = BulletproofGens(n // 2)
pts = gens.G(n // 2) + gens.H(n // 2)
src, _ = ms.prep_source(pts)
rnd = np.random.default_rng(42)
ks = [int.from_bytes(rnd.bytes(32), 'little') % L for _ in range(n)]
dig = jnp.asarray(np.ascontiguousarray(signed_digits(ks, 8).astype(np.int8).T))
wt = 32
t, p, steps = ms._static_plan(wt, n)
print("plan", t, p, steps, flush=True)

@partial(jax.jit, static_argnums=())
def s1_sort(dig):
    st, en, sv = ms._entries_sorted_packed(dig, wt, n, 128)
    return sv[:4]

@jax.jit
def s2_sched(dig):
    idx, segid, lastp, pool = ms._static_schedule(dig, wt, n, t, p, 128)
    return idx[:2, :4], pool

@jax.jit
def s3_rowgather(dig):
    idx, segid, lastp, pool = ms._static_schedule(dig, wt, n, t, p, 128)
    g64 = jnp.take(src, idx.reshape(-1), axis=0)   # [T*P, 64] int16
    return g64[:2, :4].astype(jnp.int32), pool

@jax.jit
def s4_widen_t(dig):
    idx, segid, lastp, pool = ms._static_schedule(dig, wt, n, t, p, 128)
    g = ms._gather_g3(idx, src, t, p)
    return tuple(x[0, :2, :4] for x in g)

@jax.jit
def s5_full(dig):
    return ms._msm_serial_static(dig, src, wt, n, t, p, 1, steps, 8)[:, :2, :2]

def timeit(tag, fn, iters=5):
    r = fn(); [np.asarray(x) for x in jax.tree_util.tree_leaves(r)]
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    [np.asarray(x) for x in jax.tree_util.tree_leaves(r)]
    # dispatch-all-then-sync amortizes the tunnel RT
    print(f"{tag}: {(time.perf_counter()-t0)/iters*1e3:.1f} ms", flush=True)

timeit("1 sort", lambda: s1_sort(dig))
timeit("2 +schedule", lambda: s2_sched(dig))
timeit("3 +row gather int16", lambda: s3_rowgather(dig))
timeit("4 +widen+transpose", lambda: s4_widen_t(dig))
timeit("5 full (bucket+scans+horner)", lambda: s5_full(dig))

# k=3 batched launch (the prover's A_I/A_O/S shape)
ks3 = [[int.from_bytes(rnd.bytes(32), 'little') % L for _ in range(n)]
       for _ in range(3)]
dig3 = jnp.asarray(np.concatenate(
    [np.ascontiguousarray(signed_digits(k, 8).astype(np.int8).T)
     for k in ks3], axis=0))
t3, p3, steps3 = ms._static_plan(96, n)
print("k3 plan", t3, p3, steps3, flush=True)

@jax.jit
def s6_k3(dig3):
    return ms._msm_serial_static(dig3, src, 96, n, t3, p3, 3, steps3,
                                 8)[:, :2, :2]

timeit("6 k=3 full", lambda: s6_k3(dig3))
