"""Benchmark harness: Pedersen MSM throughput on the real chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
vs_baseline is relative to the BASELINE.json north-star target of
5M scalar-mults/s/chip (the reference publishes no numbers of its own —
its AVX2/Pippenger stack is the implicit competitor, invoked at
/root/reference/src/prove.rs:79 and src/verify.rs:71).

Measures the serial-bucket Pippenger path (ops/msm_serial.py) — the
default backend — over a size sweep; the headline number is the best
throughput in the sweep.  Per-size rates and a speed-of-light fraction
(vs the HBM-traffic floor of the bucket stage) go to stderr.

BPG_TPU_MSM_SCHED=readback times the dynamic-shape readback scheduler
instead of the default static path (useful on a low-latency link; the
axon tunnel's multi-second round trips make static the right default).
(The premultiplied c=16 path measured 3.5x slower in round 2 and was
removed in round 5; the negative result lives in docs/PERFORMANCE.md.)
"""
import json
import os
import sys
import time

import numpy as np

TARGET = 5_000_000.0
HBM_GBPS = float(os.environ.get("BPG_BENCH_HBM_GBPS", "819"))  # v5e


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_size(n, rnd, msm_serial, signed_digits, L, gens):
    """One sweep point: n scalar-mults against a resident gens table."""
    import jax.numpy as jnp

    half = n // 2
    points = gens.G(half) + gens.H(half)
    t0 = time.time()
    src, _ = msm_serial.prep_source(points)
    np.asarray(src[0])
    log(f"  n={n}: source prep+upload {time.time() - t0:.1f}s")

    def scalars():
        raw = rnd.integers(0, 1 << 62, size=(n, 5), dtype=np.uint64)
        return [int(sum(int(raw[i, j]) << (62 * j) for j in range(5))) % L
                for i in range(n)]

    mode = os.environ.get("BPG_TPU_MSM_SCHED", "static")
    wt = 32
    iters = 5
    digs = [jnp.asarray(np.ascontiguousarray(
                signed_digits(scalars(), msm_serial.C).astype(np.int8).T))
            for _ in range(iters)]
    for d in digs:
        np.asarray(d[0, :4])

    if mode == "readback":
        # dynamic-shape path: per-MSM [M+1] offsets readback sizes (T, P)
        t0 = time.time()
        r = msm_serial.msm_many_digits_t(digs[0], src, n)[0]
        sink = r.compress()
        log(f"  n={n}: compile+first run {time.time() - t0:.1f}s "
            f"-> {sink.hex()[:16]}... (readback sched)")
        t0 = time.time()
        pts = [msm_serial.msm_many_digits_t(d, src, n) for d in digs]
        dt = (time.time() - t0) / iters
        last = pts[-1][0]
        t, p = 0, 0
        floor = 0.0
    else:
        # The REAL prover path: digits live on device (flvec), the whole
        # schedule is built there inside the MSM jit (static shapes), and
        # tables above _POINT_CHUNK split into per-chunk pipelines; the
        # dispatch-all-then-finish-all order amortizes the round trip.
        t, p, steps = msm_serial._static_plan(wt, n)
        t0 = time.time()
        last = msm_serial._launch_static(digs[0], src, n)[0]
        log(f"  n={n}: compile+first run {time.time() - t0:.1f}s "
            f"-> {last.compress().hex()[:16]}...")
        t0 = time.time()
        pending = [msm_serial._launch_static_async(d, src, n) for d in digs]
        pts = [msm_serial._launch_static_finish(pd) for pd in pending]
        dt = (time.time() - t0) / iters
        last = pts[-1][0]
        # HBM floor: the bucket stage gathers T*P source rows of 128 B and
        # the pool accumulators stay in VMEM; everything else is
        # lower-order.
        floor = t * p * 128 / (HBM_GBPS * 1e9)
    rate = n / dt
    log(f"  n={n}: {dt*1e3:.1f} ms/MSM -> {rate:,.0f} mults/s "
        f"(HBM floor {floor*1e3:.2f} ms, {floor/dt*100:.0f}% of light) "
        f"shape=({t}, {p}) last={last.compress().hex()[:16]}")

    return rate


def main():
    import jax
    from bulletproof_gadgets_tpu.core.scalar import L
    from bulletproof_gadgets_tpu.core.gens import BulletproofGens
    from bulletproof_gadgets_tpu.ops import engine  # wires compile cache
    from bulletproof_gadgets_tpu.ops import msm_serial
    from bulletproof_gadgets_tpu.ops.msm import signed_digits

    sizes = ([int(a) for a in sys.argv[1:]]
             or [1 << k for k in (14, 16, 17, 18)])
    log(f"backend={jax.default_backend()} sizes={sizes}")
    gens = BulletproofGens(max(sizes) // 2)
    rnd = np.random.default_rng(42)

    best = 0.0
    for n in sizes:
        best = max(best, run_size(n, rnd, msm_serial, signed_digits, L, gens))

    # the prover's REAL launch shape: A_I/A_O/S is a k=3 stacked MSM —
    # measure per-vector throughput at that configuration too (reported
    # as an extra field; the headline stays the single-vector number for
    # cross-round comparability)
    k3 = run_k3(1 << 17, rnd, msm_serial, signed_digits, L, gens)

    print(json.dumps({
        "metric": "pedersen_msm_throughput",
        "value": round(best, 1),
        "unit": "scalar-mults/s/chip",
        "vs_baseline": round(best / TARGET, 4),
        "value_k3_batched": round(k3, 1),
    }))


def run_k3(n, rnd, msm_serial, signed_digits, L, gens):
    """Per-vector throughput of a k=3 stacked launch at size n (the
    prover's A_I/A_O/S shape)."""
    import time as _t
    import jax.numpy as jnp
    half = n // 2
    src, _ = msm_serial.prep_source(gens.G(half) + gens.H(half))

    def scalars():
        raw = rnd.integers(0, 1 << 62, size=(n, 5), dtype=np.uint64)
        return [int(sum(int(raw[i, j]) << (62 * j) for j in range(5))) % L
                for i in range(n)]

    iters = 5
    digs = [jnp.asarray(np.concatenate(
        [np.ascontiguousarray(signed_digits(scalars(), 8).astype(np.int8).T)
         for _ in range(3)], axis=0)) for _ in range(iters)]
    for d in digs:
        np.asarray(d[0, :4])
    msm_serial._launch_static(digs[0], src, n)          # warm/compile
    t0 = _t.time()
    pend = [msm_serial._launch_static_async(d, src, n) for d in digs]
    pts = [msm_serial._launch_static_finish(p) for p in pend]
    dt = (_t.time() - t0) / iters
    rate = 3 * n / dt
    log(f"  k=3 n={n}: {dt*1e3:.1f} ms/launch -> {rate:,.0f} mults/s "
        f"({rate/3:,.0f}/vector x3) last={pts[-1][0].compress().hex()[:16]}")
    return rate


if __name__ == "__main__":
    main()
