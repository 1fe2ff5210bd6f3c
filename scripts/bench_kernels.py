"""Per-kernel speed-of-light accounting (BASELINE.md: "Field-arithmetic
kernels: measured against speed-of-light per chip — every kernel").

For each hot kernel: measured wall time (dispatch-all x5, one sync),
analytic int32 op count and HBM byte traffic, and the fraction of the
practical ceilings:
  * VPU: 1.4 T int32 op/s — the best sustained rate any kernel in this
    repo has reached (r3 bucket kernel); the ISA-independent dependent-
    chain rate measured by scripts/probe_int16.py is 0.52 T op/s, and
    int16/bf16 offer no higher rate (no 16-bit vector multiply exists).
  * HBM: 819 GB/s (v5e).

Op-count conventions (from the kernel structure, ops/fl.py, ops/fp.py):
  * F_l mont_mul: 3 schoolbook passes of NW=21 broadcast MACs (21 mul +
    ~21 add per output column, ~44 columns) + ~8 carry passes x 3 ops
    -> ~5.5k int32 ops per element.
  * F_p _mul (pallas): 20 MACs x 39 cols + finalize -> ~2.4k ops/elem.
  * madd (mixed point add): 7 _mul + ~8 lazy adds -> ~20k ops/slot.

Run on the TPU: python scripts/bench_kernels.py
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

VPU = 1.4e12
HBM = 819e9

rows = []


def timeit(fn, iters=5):
    r = fn()
    [np.asarray(x) for x in jax.tree_util.tree_leaves(r)]
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    [np.asarray(x) for x in jax.tree_util.tree_leaves(r)]
    return (time.perf_counter() - t0) / iters


def report(name, dt, ops, bytes_):
    t_vpu = ops / VPU
    t_hbm = bytes_ / HBM
    light = max(t_vpu, t_hbm)
    bound = "VPU" if t_vpu >= t_hbm else "HBM"
    rows.append((name, dt * 1e3, light * 1e3, 100 * light / dt, bound))
    print(f"{name}: {dt*1e3:.2f} ms, light {light*1e3:.3f} ms ({bound}), "
          f"{100*light/dt:.0f}% of light", flush=True)


def main():
    from bulletproof_gadgets_tpu.core.scalar import L
    from bulletproof_gadgets_tpu.ops import flvec, mimc_kernels
    from bulletproof_gadgets_tpu.ops.fl import mont_mul, NW
    rng = np.random.default_rng(3)

    def rand_fl(n):
        return jnp.asarray(flvec.to_limbs(
            [int.from_bytes(rng.bytes(32), "little") % L for _ in range(n)]))

    # -- F_l mont_mul [2^17] -------------------------------------------------
    n = 1 << 17
    a, b = rand_fl(n), rand_fl(n)
    f = jax.jit(lambda a, b: mont_mul(a, b)[:2])
    dt = timeit(lambda: f(a, b))
    report("fl.mont_mul 2^17", dt, n * 5500, n * NW * 4 * 3)

    # -- IPA fold (4 mont_mul + selects over 2^17) ---------------------------
    from bulletproof_gadgets_tpu.ops.ipa_device import _fold, round_masks
    mk = round_masks(n)[0]
    gc, hc = rand_fl(n), rand_fl(n)
    u, ui = rand_fl(1), rand_fl(1)
    ff = jax.jit(lambda *x: tuple(y[:2] for y in _fold(*x)))
    dt = timeit(lambda: ff(a, b, gc, hc, u, ui, mk["ga"], mk["hi"]))
    report("ipa fold 2^17", dt, n * 6 * 5500, n * NW * 4 * 10)

    # -- flatten scatter path (2^18 terms) -----------------------------------
    from bulletproof_gadgets_tpu.core.lc import (LinearCombination, Variable,
                                                 MULT_LEFT, MULT_RIGHT,
                                                 MULT_OUT)
    from bulletproof_gadgets_tpu.core.scalar import Scalar
    from bulletproof_gadgets_tpu.ops.flatten import flatten
    nm, terms_per = 4096, 64
    cons = []
    for q in range(nm):
        t = [(Variable([MULT_LEFT, MULT_RIGHT, MULT_OUT][j % 3],
                       (q * 7 + j) % nm),
              Scalar.from_int(int(rng.integers(1, 1 << 30))))
             for j in range(terms_per)]
        cons.append(LinearCombination(t))
    total = nm * terms_per
    dt = timeit(lambda: flatten(cons, nm, 8, 12345, with_wc=True).wL[:2],
                iters=3)
    report(f"flatten {total} terms", dt, total * 2 * 5500,
           total * (NW * 4 * 2 + 12))

    # -- MiMC sponge (batch 512 x 1 block, 486 rounds x 2 mul) --------------
    bs = 512
    from bulletproof_gadgets_tpu.ops.mimc_kernels import mimc_hash_batch
    msgs = [rng.bytes(32) for _ in range(bs)]
    dt = timeit(lambda: mimc_hash_batch(msgs), iters=3)
    # per element: 486 rounds x 2 mont_mul + adds; compute-bound (state
    # stays in VMEM/registers across the scan)
    report(f"mimc_hash_batch {bs}", dt, bs * 486 * 2 * 5500,
           bs * NW * 4 * 4)

    # -- prover t-poly + l/r vectors (2^17 multipliers) ----------------------
    from bulletproof_gadgets_tpu.ops.prover_device import ProverVectors
    nn = 1 << 17
    ones = [1] * nn
    pv = ProverVectors(ones, ones, ones, ones, ones,
                       rand_fl(nn), rand_fl(nn), rand_fl(nn),
                       3, pow(3, L - 2, L), nn)
    dt = timeit(lambda: pv.t_poly_device(), iters=3)
    # 6 inner products + vector builds: ~12 mont_mul-equivalents per elem
    report("prover t-poly 2^17", dt, nn * 12 * 5500, nn * NW * 4 * 12)
    dt = timeit(lambda: pv.lr(7)[0][:2], iters=3)
    report("prover l/r 2^17", dt, nn * 8 * 5500, nn * NW * 4 * 10)

    # -- device compress (k=2) ----------------------------------------------
    from bulletproof_gadgets_tpu.ops.ristretto_device import compress_cols
    from bulletproof_gadgets_tpu.ops import fp
    from bulletproof_gadgets_tpu.core.ristretto import (RISTRETTO_BASEPOINT,
                                                        P as PP)
    pts = [RISTRETTO_BASEPOINT.scalar_mul(int(rng.integers(1, 1 << 60)))
           for _ in range(2)]
    cols = np.zeros((4, fp.NL, 2), np.int32)
    for i, pt in enumerate(pts):
        for ci, v in enumerate((pt.X, pt.Y, pt.Z, pt.T)):
            cols[ci, :, i] = fp.to_limbs_np([v])[0]
    colsd = jnp.asarray(cols)
    f = jax.jit(compress_cols)
    dt = timeit(lambda: f(colsd))
    # ~253 squarings + ~130 muls of F_p (2.4k ops each) x 2 points + logic
    report("ristretto compress k=2", dt, 2 * 400 * 2400, 1 << 16)

    # -- transcript fs step (absorb 2x32B + challenge + invert) -------------
    from bulletproof_gadgets_tpu.ops import ipa_fused
    fs_fn, _ = ipa_fused._get_fs_jit((64, 60, 7))
    state = jnp.zeros((200,), jnp.int32)
    enc = jnp.zeros((2, 32), jnp.int32)
    dt = timeit(lambda: fs_fn(state, enc))
    # 2 keccak-f (~5k ops) + 505 single-elem mont_muls (~5.5k ops each,
    # on 8x128-padded tiles -> latency-bound, light is meaningless; report
    # vs the dependent-chain floor 505 x ~60ns
    report("transcript fs step", dt, 505 * 5500 + 2 * 5000, 4 << 10)

    # -- bucket kernel reference (from bench.py r4: 62.9 ms @ 2^17) ---------
    print("\n| kernel | measured | light bound | % of light | bound |",
          flush=True)
    print("|---|---|---|---|---|", flush=True)
    for nme, dtm, lightm, pct, bound in rows:
        print(f"| {nme} | {dtm:.2f} ms | {lightm:.3f} ms | {pct:.0f}% | "
              f"{bound} |", flush=True)


if __name__ == "__main__":
    main()
