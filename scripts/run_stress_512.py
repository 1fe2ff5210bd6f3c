"""2^20-gens 512-leaf Merkle stress (reference merkle_tree_gadget.rs:474,
#[ignore]d) on the real chip, with per-phase progress + wall/RSS record."""
import sys, os, time, resource
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def mark(tag, t0=[time.time()]):
    now = time.time()
    print(f"[{now-t0[0]:8.1f}s] {tag}", flush=True)

from bulletproof_gadgets_tpu.core.gens import PedersenGens, BulletproofGens
from bulletproof_gadgets_tpu.core.r1cs import Prover, Verifier, R1CSError
from bulletproof_gadgets_tpu.core.transcript import ProofError
from bulletproof_gadgets_tpu.core.commitments import (commit_all_single,
                                                      verifier_commit)
from bulletproof_gadgets_tpu.core.lc import to_lc
from bulletproof_gadgets_tpu.utils.merlin import Transcript
from bulletproof_gadgets_tpu.utils.conversions import be_to_scalar
from bulletproof_gadgets_tpu.utils import rng
from bulletproof_gadgets_tpu.models.merkle_tree import MerkleTree256, Hash, W

rng.set_seed("stress-512")
mark("imports done")
root = be_to_scalar(bytes.fromhex(
    "038c137beec8e2edfb5c48cbd063f04e569139d2221a4eb7befb85aa1bf8ba40"))
pat = Hash(W, W)
for _ in range(8):
    pat = Hash(pat, pat)
MW1 = "0522a64d7b931e21760cf955a15fcc793e8a52b42a56ab03afddec8beb668749"
witnesses = [bytes.fromhex(MW1)] * 512
pc = PedersenGens.default()
bp = BulletproofGens(1048576, 1)
mark("gens loaded")
t = Transcript(b"MerkleTree")
prover = Prover(pc, t)
_, coms, variables = commit_all_single(prover, witnesses)
mark("512 witness commits")
gadget = MerkleTree256(to_lc(root), [], [v.lc() for v in variables], pat)
gadget.prove(prover, [], [])
mark(f"assembly done: {prover.num_constraints()} constraints, "
     f"{prover.get_num_multiplications()} multipliers")
gen = prover.prove_gen(bp)
resp = None
i = 0
while True:
    try:
        kind, table, dig = gen.send(resp)
    except StopIteration as stop:
        proof = stop.value
        break
    mark(f"prove yield {i}: {kind}")
    if kind == "msm":
        resp = table.msm_digits(dig)
    elif kind == "msm_enc":
        resp = table.msm_digits_enc_finish(table.msm_digits_enc_launch(dig))
    elif kind == "fused_ipa":
        from bulletproof_gadgets_tpu.ops import ipa_fused
        resp = ipa_fused.create(dig[0], table, *dig[1:])
    else:
        resp = np.asarray(dig)
    mark(f"prove yield {i}: {kind} answered")
    i += 1
mark("PROVE DONE")
t2 = Transcript(b"MerkleTree")
verifier = Verifier(t2)
w_vars = verifier_commit(verifier, coms)
gadget_v = MerkleTree256(to_lc(root), [], [v.lc() for v in w_vars], pat)
gadget_v.verify(verifier, w_vars, [])
mark("verifier assembly done")
verifier.verify(proof, pc, bp)
mark("VERIFY OK")
rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
print(f"512-leaf Merkle (2^20 gens): PROVE+VERIFY OK, host peak RSS "
      f"{rss:.1f} GB", flush=True)
