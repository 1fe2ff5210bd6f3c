#!/usr/bin/env python
"""A/B the row-layout bucket kernel (in-kernel widen+transpose,
BPG_TPU_MSM_ROWS=1) against the baseline at bench shapes.

The env flag is baked at trace time, so each variant runs in a fresh
subprocess.  Usage: python scripts/probe_rows.py [n_log2 ...]
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

CHILD = r"""
import os, sys, time
sys.path.insert(0, @REPO@)
import numpy as np
import jax.numpy as jnp
from bulletproof_gadgets_tpu.core.gens import BulletproofGens
from bulletproof_gadgets_tpu.core.scalar import L
from bulletproof_gadgets_tpu.ops import msm_serial
from bulletproof_gadgets_tpu.ops.msm import signed_digits

n = 1 << @LG@
rnd = np.random.default_rng(7)
gens = BulletproofGens(n // 2)
points = gens.G(n // 2) + gens.H(n // 2)
src, _ = msm_serial.prep_source(points)
np.asarray(src[0])

def scalars():
    raw = rnd.integers(0, 1 << 62, size=(n, 5), dtype=np.uint64)
    return [int(sum(int(raw[i, j]) << (62 * j) for j in range(5))) % L
            for i in range(n)]

iters = 5
digs = [jnp.asarray(np.ascontiguousarray(
            signed_digits(scalars(), 8).astype(np.int8).T))
        for _ in range(iters)]
for d in digs:
    np.asarray(d[0, :4])
t0 = time.time()
last = msm_serial._launch_static(digs[0], src, n)[0]
print(f"  compile+first {time.time()-t0:.1f}s -> "
      f"{last.compress().hex()[:16]}", flush=True)
t0 = time.time()
pending = [msm_serial._launch_static_async(d, src, n) for d in digs]
pts = [msm_serial._launch_static_finish(pd) for pd in pending]
dt = (time.time() - t0) / iters
print(f"  n=2^@LG@ rows=@ROWS@: {dt*1e3:.1f} ms/MSM -> "
      f"{n/dt:,.0f} mults/s  last={pts[-1][0].compress().hex()[:16]}",
      flush=True)
"""


def main():
    lgs = [int(a) for a in sys.argv[1:]] or [17]
    repo = os.path.dirname(HERE)
    for lg in lgs:
        for rows in ("0", "1"):
            env = dict(os.environ, BPG_TPU_MSM_ROWS=rows)
            print(f"n=2^{lg} rows={rows}:", flush=True)
            subprocess.run(
                [sys.executable, "-c",
                 CHILD.replace("@REPO@", repr(repo))
                 .replace("@LG@", str(lg))
                 .replace("@ROWS@", rows)],
                env=env, check=True)


if __name__ == "__main__":
    main()
