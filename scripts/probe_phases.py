import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from bulletproof_gadgets_tpu.utils import rng
from bulletproof_gadgets_tpu.lang.prove import prove_prepared

name = sys.argv[1] if len(sys.argv) > 1 else 'merkle_tree'
base = f'/root/reference/tests/resources/{name}'
inst = open(base+'.inst').read(); wtns = open(base+'.wtns').read(); gadg = open(base+'.gadgets').read()
rng.set_seed('probe')

# phase instrumentation: wrap key boundaries
from bulletproof_gadgets_tpu.ops import ipa_fused, prover_device
from bulletproof_gadgets_tpu.core import r1cs

marks = []
def mark(tag):
    marks.append((tag, time.perf_counter()))

_create = ipa_fused.create
def create_timed(*a, **k):
    mark('ipa_start')
    r = _create(*a, **k)
    mark('ipa_end')
    return r
ipa_fused.create = create_timed

_tp = prover_device.ProverVectors.t_poly_device
def tp_timed(self):
    mark('tpoly_start')
    r = _tp(self)
    return r
prover_device.ProverVectors.t_poly_device = tp_timed

def run(tag):
    marks.clear()
    t0 = time.perf_counter()
    coms = []
    prover, bp, nc = prove_prepared(name, inst, wtns, gadg, coms)
    mark('prep')
    gen = prover.prove_gen(bp)
    resp = None
    import numpy as _np
    while True:
        try:
            kind, table, dig = gen.send(resp)
        except StopIteration as stop:
            proof = stop.value
            break
        if kind == 'msm':
            mark('msm_dispatch')
            resp = table.msm_digits(dig)
            mark('msm_done')
        elif kind == 'msm_enc':
            mark('msm_dispatch')
            resp = table.msm_digits_enc_finish(
                table.msm_digits_enc_launch(dig))
            mark('msm_done')
        elif kind == 'fused_ipa':
            from bulletproof_gadgets_tpu.ops import ipa_fused
            mark('ipa_dispatch')
            resp = ipa_fused.create(dig[0], table, *dig[1:])
            mark('ipa_done')
        else:
            resp = _np.asarray(dig)
            mark('fetch_done')
    mark('end')
    prev = t0
    out = []
    for tag2, t in marks:
        out.append(f"{tag2}:{t-prev:.2f}")
        prev = t
    print(f"{tag}: " + "  ".join(out), flush=True)

for i in range(3):
    run(f"run{i}")
