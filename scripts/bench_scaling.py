#!/usr/bin/env python
"""Sharded-MSM scaling curve on the virtual CPU mesh (+ single-chip
overhead check on TPU).

Usage:
  python scripts/bench_scaling.py cpu    # 1/2/4/8-device virtual mesh curve
  python scripts/bench_scaling.py tpu    # sharded (D=1) vs plain on the chip

The CPU run times the sharded window-sum stage (ShardedGeneratorTable
msm_digits, warm) at fixed TOTAL problem size (strong scaling).  CPU
interpret-mode Pallas distorts absolute numbers — the curve measures the
sharding overhead structure (per-shard schedule build, collective combine),
not TPU kernel throughput; see SCALING.md for interpretation.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _scalars(rnd, n, L):
    import numpy as np
    raw = rnd.integers(0, 1 << 62, size=(n, 5), dtype=np.uint64)
    return [int(sum(int(raw[i, j]) << (62 * j) for j in range(5))) % L
            for i in range(n)]


def main_cpu():
    os.environ.setdefault(
        "XLA_FLAGS",
        (os.environ.get("XLA_FLAGS", "")
         + " --xla_force_host_platform_device_count=8").strip())
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from bulletproof_gadgets_tpu.core.scalar import L
    from bulletproof_gadgets_tpu.core.gens import (PedersenGens,
                                                   BulletproofGens)
    from bulletproof_gadgets_tpu.ops import msm_serial
    from bulletproof_gadgets_tpu.parallel.mesh import make_mesh
    from bulletproof_gadgets_tpu.parallel.sharded_serial import (
        ShardedGeneratorTable)

    n_half = 512                      # table m = 2*512 + 2
    pc = PedersenGens.default()
    bp = BulletproofGens(n_half, 1)
    G, H = bp.G(n_half), bp.H(n_half)
    rnd = np.random.default_rng(11)
    vec = [_scalars(rnd, 2 * n_half + 2, L) for _ in range(3)]

    print("strong scaling, m=%d table, k=3 launch, warm timings"
          % (2 * n_half + 2))
    base = None
    for d in (1, 2, 4, 8):
        mesh = make_mesh(n_shard=d, n_batch=1)
        if d == 1:
            tab = msm_serial.GeneratorTable(G, H, pc.B, pc.B_blinding)
        else:
            tab = ShardedGeneratorTable(mesh, G, H, pc.B, pc.B_blinding)
        r = tab.msm_many(vec)         # compile
        iters = 3
        t0 = time.time()
        for _ in range(iters):
            r = tab.msm_many(vec)
        dt = (time.time() - t0) / iters
        if base is None:
            base = dt
        eff = base / dt / d * 100 if d > 1 else 100.0
        print(f"  D={d}: {dt*1e3:8.1f} ms/launch  speedup {base/dt:5.2f}x "
              f"  efficiency {eff:5.1f}%", flush=True)


def main_tpu():
    import numpy as np
    from bulletproof_gadgets_tpu.core.scalar import L
    from bulletproof_gadgets_tpu.core.gens import (PedersenGens,
                                                   BulletproofGens)
    from bulletproof_gadgets_tpu.ops import engine, msm_serial
    from bulletproof_gadgets_tpu.parallel.mesh import make_mesh
    from bulletproof_gadgets_tpu.parallel.sharded_serial import (
        ShardedGeneratorTable)

    n_half = 1 << 15
    pc = PedersenGens.default()
    bp = BulletproofGens(n_half, 1)
    G, H = bp.G(n_half), bp.H(n_half)
    rnd = np.random.default_rng(11)
    vec = [_scalars(rnd, 2 * n_half + 2, L)]

    mesh = make_mesh(n_shard=1, n_batch=1)
    for label, tab in (
            ("plain", msm_serial.GeneratorTable(G, H, pc.B, pc.B_blinding)),
            ("sharded D=1",
             ShardedGeneratorTable(mesh, G, H, pc.B, pc.B_blinding))):
        r = tab.msm_many(vec)
        iters = 3
        t0 = time.time()
        for _ in range(iters):
            r = tab.msm_many(vec)
        dt = (time.time() - t0) / iters
        print(f"  {label}: {dt*1e3:.1f} ms/MSM (m={2*n_half+2})",
              flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    (main_cpu if mode == "cpu" else main_tpu)()
