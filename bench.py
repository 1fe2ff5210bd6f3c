"""Benchmark harness: Pedersen MSM throughput on the real chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
vs_baseline is relative to the BASELINE.json north-star target of
5M scalar-mults/s/chip (the reference publishes no numbers of its own —
its AVX2/Pippenger stack is the implicit competitor).

Extra diagnostics go to stderr.
"""
import json
import sys
import time

import numpy as np

TARGET = 5_000_000.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from bulletproof_gadgets_tpu.core.ristretto import RISTRETTO_BASEPOINT
    from bulletproof_gadgets_tpu.core.scalar import L
    from bulletproof_gadgets_tpu.ops import curve, msm as msm_ops, msm_cols
    from bulletproof_gadgets_tpu.ops.pallas_curve import to_cols

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 16
    c = msm_ops.choose_c(n)
    log(f"backend={jax.default_backend()} n={n} c={c}")

    # Device-side point generation: prefix scan of n copies of the basepoint
    # gives [B, 2B, ..., nB] without host big-int work.
    base = curve.points_to_device([RISTRETTO_BASEPOINT])
    tiled = to_cols(tuple(jnp.tile(x, (n, 1)) for x in base))
    t0 = time.time()
    points = msm_cols._masked_scan(tiled, n, (n - 1).bit_length())
    points = tuple(np.asarray(x) for x in points)  # force + keep resident
    points = tuple(jnp.asarray(x) for x in points)
    log(f"point generation: {time.time() - t0:.1f}s")

    rnd = np.random.default_rng(42)
    raw = rnd.integers(0, 1 << 62, size=(n, 5), dtype=np.uint64)
    ks = [int(sum(int(raw[i, j]) << (62 * j) for j in range(5))) % L
          for i in range(n)]
    digits = msm_ops.signed_digits(ks, c)

    # warmup/compile
    t0 = time.time()
    ws = msm_cols.window_sums(digits, points, c)
    sink0 = int(np.asarray(ws[0]).sum())
    log(f"compile+first run: {time.time() - t0:.1f}s")

    iters = 3
    t0 = time.time()
    sink = 0
    for _ in range(iters):
        ws = msm_cols.window_sums(digits, points, c)
        # force full materialization on host: block_until_ready may be lazy
        # across remote-device tunnels
        sink ^= int(np.asarray(ws[0]).sum())
    dt = (time.time() - t0) / iters
    log(f"sink={sink}")
    result = msm_ops.horner_combine(ws, c)
    log(f"per-MSM wall: {dt:.3f}s; result {result.compress().hex()[:16]}...")

    rate = n / dt
    print(json.dumps({
        "metric": "pedersen_msm_throughput",
        "value": round(rate, 1),
        "unit": "scalar-mults/s/chip",
        "vs_baseline": round(rate / TARGET, 4),
    }))


if __name__ == "__main__":
    main()
