#!/usr/bin/env python
"""Build (and disk-cache) c=16 premultiplied MSM tables.

NOTE (round 3): the premul path measured 3.5x SLOWER than the plain c=8
serial-bucket kernel at n=2^16 (bucket-occupancy slack + 32x table gather
traffic; docs/PERFORMANCE.md) and is EXCLUDED from bench.py by default.
Only build tables if you set BPG_BENCH_PREMUL=1 to re-measure it.

The table build is host-side point arithmetic (~2 min per 2^16 points):

    python scripts/build_premul_tables.py [n ...]      # default: 65536
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")          # no TPU needed


def main():
    from bulletproof_gadgets_tpu.core.gens import BulletproofGens
    from bulletproof_gadgets_tpu.ops import msm_premul

    sizes = [int(a) for a in sys.argv[1:]] or [1 << 16]
    gens = BulletproofGens(max(sizes) // 2)
    for n in sizes:
        points = gens.G(n // 2) + gens.H(n // 2)
        path = msm_premul._cache_path(points)
        if os.path.exists(path):
            print(f"n={n}: cached at {path}")
            continue
        t0 = time.time()
        msm_premul.premul_source(points)
        print(f"n={n}: built in {time.time() - t0:.1f}s -> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
