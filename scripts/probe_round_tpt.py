import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from bulletproof_gadgets_tpu.core.gens import PedersenGens, BulletproofGens
from bulletproof_gadgets_tpu.core.scalar import L
from bulletproof_gadgets_tpu.ops import msm_serial, flvec, ipa_fused
from bulletproof_gadgets_tpu.ops.ipa_device import round_masks

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
u = rand_rows(1); ui = rand_rows(1)
masks = round_masks(N)
mk = masks[1]
c = 8
t_r, p, steps = msm_serial._static_plan(64, m, c=c, fill=0.5)
msm_fn = ipa_fused._get_msm_jit(False, m, t_r, p, steps, c)
meta = (64, 60, 7)
fs_fn, _ = ipa_fused._get_fs_jit(meta)
state = jnp.zeros((200,), jnp.int32)

args = lambda: (a, b, gc, hc, u, ui, wr2, table.src, mk["ga"], mk["hi"],
                mk["ga"], mk["hi"], mk["cs"], mk["lo_i"], mk["hi_i"],
                mk["tL"], mk["tH"], mk["remap"])
out = msm_fn(*args()); np.asarray(out[4])
K = 17
t0 = time.perf_counter()
outs = [msm_fn(*args()) for _ in range(K)]
np.asarray(outs[-1][4])
dt = (time.perf_counter()-t0)/K
print(f"msm_fn: {dt*1e3:.1f} ms/round (dispatch-all)", flush=True)

st, um, uim = fs_fn(state, out[4]); np.asarray(st[:1])
t0 = time.perf_counter()
s2 = state
for _ in range(K):
    s2, um, uim = fs_fn(s2, out[4])
np.asarray(s2[:1])
print(f"fs_fn: {(time.perf_counter()-t0)/K*1e3:.1f} ms/round", flush=True)

# chained like the real loop: msm -> fs -> msm (data dependency via u)
t0 = time.perf_counter()
aa, bb, gg, hh = a, b, gc, hc
s2 = state; um2, uim2 = u, ui
for _ in range(K):
    aa, bb, gg, hh, enc, pool = msm_fn(aa, bb, gg, hh, um2, uim2, wr2,
        table.src, mk["ga"], mk["hi"], mk["ga"], mk["hi"], mk["cs"],
        mk["lo_i"], mk["hi_i"], mk["tL"], mk["tH"], mk["remap"])
    s2, um2, uim2 = fs_fn(s2, enc)
np.asarray(s2[:1])
print(f"chained: {(time.perf_counter()-t0)/K*1e3:.1f} ms/round", flush=True)

# adjudicate: the REAL create() on random inputs, same process
from bulletproof_gadgets_tpu.utils.merlin import Transcript
from bulletproof_gadgets_tpu.core.transcript import innerproduct_domain_sep
G_factors = [1] * N
H_factors = [int.from_bytes(rng.bytes(32), 'little') % L for _ in range(N)]
av = [int.from_bytes(rng.bytes(32), 'little') % L for _ in range(N)]
bv = [int.from_bytes(rng.bytes(32), 'little') % L for _ in range(N)]
w = int.from_bytes(rng.bytes(32), 'little') % L
for i in range(3):
    t = Transcript(b"tpt")
    innerproduct_domain_sep(t, N)
    t0 = time.perf_counter()
    ipa_fused.create(t, table, w, G_factors, H_factors, list(av), list(bv))
    print(f"create {i}: {time.perf_counter()-t0:.2f}s", flush=True)
