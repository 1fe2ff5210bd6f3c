"""SDK-path tests: multiple gadgets sharing one constraint system / proof
(reference tests/combine_gadgets.rs), plus proof determinism under a fixed
blinding seed (the framework's race/determinism guard, SURVEY.md §5.2)."""
import pytest

from bulletproof_gadgets_tpu.core.gens import PedersenGens, BulletproofGens
from bulletproof_gadgets_tpu.core.r1cs import Prover, Verifier
from bulletproof_gadgets_tpu.utils.merlin import Transcript
from bulletproof_gadgets_tpu.utils.conversions import be_to_scalar
from bulletproof_gadgets_tpu.utils import rng
from bulletproof_gadgets_tpu.models.bounds_check import BoundsCheck
from bulletproof_gadgets_tpu.models.equality import Equality
from bulletproof_gadgets_tpu.models.inequality import Inequality
from bulletproof_gadgets_tpu.lang.prove import prove
from bulletproof_gadgets_tpu.lang.verify import verify


@pytest.fixture(autouse=True)
def _seeded():
    rng.set_seed("sdk")
    yield
    rng.set_seed(None)


def test_combined_gadgets_one_proof():
    """BoundsCheck + Equality + Inequality sharing witnesses in ONE
    constraint system and one proof."""
    pc = PedersenGens.default()
    value = bytes([67])

    t = Transcript(b"Combined")
    prover = Prover(pc, t)
    scalar = be_to_scalar(value)
    com, var = prover.commit(scalar, rng.random_scalar())

    bounds = BoundsCheck(bytes([10]), bytes([100]))
    d_coms_b, d_wtns_b = bounds.setup(prover, [scalar])
    bounds.prove(prover, [var], d_wtns_b)

    eq = Equality([var.lc()])  # trivially W == W
    eq.prove(prover, [var], [])

    # Inequality right-hand as constant LCs
    from bulletproof_gadgets_tpu.core.lc import to_lc
    rhs_scalar = be_to_scalar(bytes([99]))
    uneq = Inequality([to_lc(rhs_scalar)], [rhs_scalar])
    d_coms_u, d_wtns_u = uneq.setup(prover, [scalar])
    uneq.prove(prover, [var], d_wtns_u)

    bp = BulletproofGens(64, 1)
    proof = prover.prove(bp)

    t2 = Transcript(b"Combined")
    verifier = Verifier(t2)
    var_v = verifier.commit(com)
    d_vars_b = [verifier.commit(cb) for cb in d_coms_b]
    bounds.verify(verifier, [var_v], d_vars_b)
    eq2 = Equality([var_v.lc()])
    eq2.verify(verifier, [var_v], [])
    d_vars_u = [verifier.commit(cu) for cu in d_coms_u]
    uneq2 = Inequality([to_lc(rhs_scalar)], None)
    uneq2.verify(verifier, [var_v], d_vars_u)
    verifier.verify(proof, pc, bp)  # raises on failure


def test_proof_determinism():
    """Same seed + inputs -> identical proof bytes and commitments."""
    name = "equality"
    base = "/root/reference/tests/resources/" + name
    with open(base + ".inst") as f:
        instance = f.read()
    with open(base + ".wtns") as f:
        witness = f.read()
    with open(base + ".gadgets") as f:
        gadgets = f.read()

    rng.set_seed("determinism")
    coms1 = []
    proof1, _ = prove(name, instance, witness, gadgets, coms1)
    rng.set_seed("determinism")
    coms2 = []
    proof2, _ = prove(name, instance, witness, gadgets, coms2)
    assert proof1 == proof2
    assert coms1 == coms2
    # and a different seed still verifies but differs
    rng.set_seed("other")
    coms3 = []
    proof3, _ = prove(name, instance, witness, gadgets, coms3)
    assert proof3 != proof1
    assert verify(name, instance, proof3, "".join(coms3), gadgets)
