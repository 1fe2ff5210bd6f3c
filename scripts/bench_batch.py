#!/usr/bin/env python
"""Batched-witness proving benchmark (DP axis): sequential vs lockstep.

Measures per-witness prove cost for one circuit over many witnesses at
batch sizes 8 and 32, warm (shapes compiled by a throwaway first batch).
Target: >= 3x per-witness speedup at batch 32 on one chip (VERDICT r2
item 5; BASELINE.json "batched witnesses" config).

Usage: python scripts/bench_batch.py [gadget]   # default BOUND (64-bit)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import numpy as np
    from bulletproof_gadgets_tpu.lang.batch import prove_batch, verify_batch
    from bulletproof_gadgets_tpu.lang.prove import prove
    from bulletproof_gadgets_tpu.utils import rng

    name = "benchbatch"
    gadgets = "BOUND W0 I0 I1"
    instance = "I0 = 0x00\nI1 = 0xffffffffffffffff\n"

    rnd = np.random.default_rng(3)

    def witnesses(k):
        return [f"W0 = 0x{int(rnd.integers(1, 1 << 63)):016x}\n"
                for _ in range(k)]

    rng.set_seed("bench-batch")

    for bs in (8, 32):
        ws = witnesses(bs)
        # warm ALL shapes for this batch size (combined-launch chunk shapes
        # depend on the batch size) plus the sequential path's shapes
        t0 = time.time()
        coms = []
        prove(name, instance, ws[0], gadgets, coms)
        prove_batch(name, instance, ws, gadgets)
        print(f"batch={bs}: warmup {time.time()-t0:.1f}s", flush=True)

        t0 = time.time()
        seq = []
        for w in ws:
            coms = []
            p, nc = prove(name, instance, w, gadgets, coms)
            seq.append((p, "".join(coms)))
        t_seq = (time.time() - t0) / bs

        t0 = time.time()
        batched = prove_batch(name, instance, ws, gadgets)
        t_bat = (time.time() - t0) / bs

        oks = verify_batch(name, instance,
                           [(p, c) for p, _, c in batched], gadgets)
        assert oks == [True] * bs, "batched proofs failed verification"
        print(f"batch={bs:3d}: sequential {t_seq*1e3:7.1f} ms/witness, "
              f"lockstep {t_bat*1e3:7.1f} ms/witness, "
              f"speedup {t_seq/t_bat:.2f}x", flush=True)


if __name__ == "__main__":
    main()
