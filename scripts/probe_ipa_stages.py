import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from bulletproof_gadgets_tpu.core.gens import PedersenGens, BulletproofGens
from bulletproof_gadgets_tpu.core.scalar import L
from bulletproof_gadgets_tpu.ops import msm_serial, flvec
from bulletproof_gadgets_tpu.ops.ipa_device import round_masks, _scalars, _fold, _scalar_rows
from bulletproof_gadgets_tpu.ops.ristretto_device import compress_cols

N = 1 << 17
pc = PedersenGens.default()
bp = BulletproofGens(N)
table = msm_serial.GeneratorTable(list(bp.G(N)), list(bp.H(N)), pc.B, pc.B_blinding)
m = table.m
rng = np.random.default_rng(7)
def rand_rows(k):
    return jnp.asarray(flvec.to_limbs([int.from_bytes(rng.bytes(32), 'little') % L for _ in range(k)]))
a = rand_rows(N); b = rand_rows(N); gc = rand_rows(N); hc = rand_rows(N)
wr2 = rand_rows(1)[0]
masks = round_masks(N)
mk = masks[0]
t, p, steps = msm_serial._static_plan(64, m, c=8, fill=0.5)
print("plan", t, p, steps, flush=True)

# tiny-output jitted stage wrappers (no big readbacks)
@jax.jit
def j_scalars(a, b, gc, hc, wr2, ga, hi, cs, lo_i, hi_i):
    return _scalars(a, b, gc, hc, wr2, ga, hi, cs, lo_i, hi_i)[:, :4]

@jax.jit
def j_rows(a, b, gc, hc, wr2, ga, hi, cs, lo_i, hi_i):
    return _scalar_rows(a, b, gc, hc, wr2, ga, hi, cs, lo_i, hi_i)[:4]

@partial(jax.jit, static_argnums=())
def j_sortonly(a, b, gc, hc, wr2, ga, hi, cs, lo_i, hi_i):
    dig = _scalars(a, b, gc, hc, wr2, ga, hi, cs, lo_i, hi_i)
    s0, e0, sv = msm_serial._entries_sorted_packed(dig, 64, m, 128)
    return sv[:4]

@jax.jit
def j_msm(a, b, gc, hc, wr2, ga, hi, cs, lo_i, hi_i, src):
    dig = _scalars(a, b, gc, hc, wr2, ga, hi, cs, lo_i, hi_i)
    cols = msm_serial._msm_serial_static(dig, src, 64, m, t, p, 2, steps, 8)
    return cols[:, :2, :]

@jax.jit
def j_msm_compress(a, b, gc, hc, wr2, ga, hi, cs, lo_i, hi_i, src):
    dig = _scalars(a, b, gc, hc, wr2, ga, hi, cs, lo_i, hi_i)
    cols = msm_serial._msm_serial_static(dig, src, 64, m, t, p, 2, steps, 8)
    return compress_cols(cols[:, :, :2])

@jax.jit
def j_fold(a, b, gc, hc, u, ui, ga, hi):
    r = _fold(a, b, gc, hc, u, ui, ga, hi)
    return tuple(x[:2] for x in r)

args = (a, b, gc, hc, wr2, mk["ga"], mk["hi"], mk["cs"], mk["lo_i"], mk["hi_i"])
u = rand_rows(1); ui = rand_rows(1)

def timeit(tag, fn, iters=5):
    r = fn(); [np.asarray(x) for x in jax.tree_util.tree_leaves(r)]
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
        [np.asarray(x) for x in jax.tree_util.tree_leaves(r)]
    print(f"{tag}: {(time.perf_counter()-t0)/iters*1e3:.1f} ms", flush=True)

timeit("rows only", lambda: j_rows(*args))
timeit("rows+digits", lambda: j_scalars(*args))
timeit("rows+digits+sort", lambda: j_sortonly(*args))
timeit("rows..+MSM", lambda: j_msm(*args, table.src))
timeit("rows..+MSM+compress", lambda: j_msm_compress(*args, table.src))
timeit("fold", lambda: j_fold(a, b, gc, hc, u, ui, mk["ga"], mk["hi"]))
