import os, sys, time
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from bulletproof_gadgets_tpu.utils import rng
from bulletproof_gadgets_tpu.lang.prove import prove_prepared
from bulletproof_gadgets_tpu.lang.verify import verify

base = '/root/reference/tests/resources/merkle_tree'
inst = open(base+'.inst').read(); wtns = open(base+'.wtns').read(); gadg = open(base+'.gadgets').read()
rng.set_seed('probe')

def one(tag):
    t0 = time.perf_counter()
    coms = []
    prover, bp, nc = prove_prepared('merkle_tree', inst, wtns, gadg, coms)
    t1 = time.perf_counter()
    proof = prover.prove(bp)
    t2 = time.perf_counter()
    print(f"{tag}: prep {t1-t0:.2f}s  prove {t2-t1:.2f}s  total {t2-t0:.2f}s", flush=True)
    return proof.to_bytes(), coms

for i in range(3):
    pb, coms = one(f"run{i}")
t0 = time.perf_counter()
ok = verify('merkle_tree', inst, pb, ''.join(coms), gadg)
print(f"verify {time.perf_counter()-t0:.2f}s ok={ok}", flush=True)
