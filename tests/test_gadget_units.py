"""Gadget-level unit tests over the SDK path (commit -> setup -> prove ->
prover.prove -> verifier_commit -> verify -> verifier.verify), mirroring the
reference's in-module #[cfg(test)] suites (SURVEY.md §4) — sized for the
quick CPU suite."""
import pytest

from bulletproof_gadgets_tpu.core.gens import PedersenGens, BulletproofGens
from bulletproof_gadgets_tpu.core.r1cs import Prover, Verifier, R1CSError
from bulletproof_gadgets_tpu.core.transcript import ProofError
from bulletproof_gadgets_tpu.core.commitments import (commit, commit_single,
                                                      verifier_commit)
from bulletproof_gadgets_tpu.core.lc import to_lc
from bulletproof_gadgets_tpu.utils.merlin import Transcript
from bulletproof_gadgets_tpu.utils.conversions import be_to_scalar
from bulletproof_gadgets_tpu.utils import rng
from bulletproof_gadgets_tpu.models.bounds_check import BoundsCheck
from bulletproof_gadgets_tpu.models.equality import Equality
from bulletproof_gadgets_tpu.models.set_membership import SetMembership


@pytest.fixture(autouse=True)
def _seeded():
    rng.set_seed("gadget-units")
    yield
    rng.set_seed(None)


def _run(label, gadget, witness_bytes, gens_size, expect_ok=True,
         verify_gadget=None):
    pc = PedersenGens.default()
    bp = BulletproofGens(gens_size, 1)

    t = Transcript(label)
    prover = Prover(pc, t)
    scalars, coms, variables = commit(prover, witness_bytes)
    d_coms, d_wtns = gadget.setup(prover, scalars)
    gadget.prove(prover, variables, d_wtns)
    proof = prover.prove(bp)

    t2 = Transcript(label)
    verifier = Verifier(t2)
    w_vars = verifier_commit(verifier, coms)
    d_vars = verifier_commit(verifier, d_coms)
    (verify_gadget or gadget).verify(verifier, w_vars, d_vars)
    try:
        verifier.verify(proof, pc, bp)
        ok = True
    except (R1CSError, ProofError):
        ok = False
    assert ok == expect_ok


def test_bounds_check_gadget():
    # reference bounds_check_gadget.rs:74-99 (10 <= 67 <= 100)
    _run(b"BoundsCheck", BoundsCheck(bytes([10]), bytes([100])),
         bytes([67]), 16)


def test_bounds_check_gadget_out_of_range():
    _run(b"BoundsCheck", BoundsCheck(bytes([10]), bytes([100])),
         bytes([101]), 16, expect_ok=False)


def test_equality_gadget_negative():
    right = [to_lc(be_to_scalar(bytes([42])))]
    _run(b"Equality", Equality(right), bytes([41]), 4, expect_ok=False)


def test_equality_gadget_positive():
    right = [to_lc(be_to_scalar(bytes([41])))]
    _run(b"Equality", Equality(right), bytes([41]), 4)


def test_equality_length_mismatch_poisons():
    # LEFT has 2 limbs, RIGHT 1 -> constrain 1 = 0 -> unsatisfiable
    right = [to_lc(be_to_scalar(bytes([1])))]
    _run(b"Equality", Equality(right), bytes([7]) * 40, 4, expect_ok=False)


def test_set_membership_gadget():
    member = be_to_scalar(bytes([5]))
    instance_scalars = [be_to_scalar(bytes([4])), be_to_scalar(bytes([5])),
                        be_to_scalar(bytes([9]))]
    instance_lcs = [to_lc(s) for s in instance_scalars]
    gadget = SetMembership(to_lc(member), member, instance_lcs,
                           instance_scalars)

    pc = PedersenGens.default()
    bp = BulletproofGens(8, 1)
    t = Transcript(b"SetMember")
    prover = Prover(pc, t)
    d_coms, d_wtns = gadget.setup(prover, [])
    gadget.prove(prover, [], d_wtns)
    proof = prover.prove(bp)

    t2 = Transcript(b"SetMember")
    verifier = Verifier(t2)
    d_vars = verifier_commit(verifier, d_coms)
    gadget_v = SetMembership(to_lc(member), None, instance_lcs, None)
    gadget_v.verify(verifier, [], d_vars)
    verifier.verify(proof, pc, bp)


def test_set_membership_not_member():
    member = be_to_scalar(bytes([6]))
    instance_scalars = [be_to_scalar(bytes([4])), be_to_scalar(bytes([5]))]
    instance_lcs = [to_lc(s) for s in instance_scalars]
    gadget = SetMembership(to_lc(member), member, instance_lcs,
                           instance_scalars)
    pc = PedersenGens.default()
    bp = BulletproofGens(8, 1)
    t = Transcript(b"SetMember")
    prover = Prover(pc, t)
    d_coms, d_wtns = gadget.setup(prover, [])
    gadget.prove(prover, [], d_wtns)
    proof = prover.prove(bp)
    t2 = Transcript(b"SetMember")
    verifier = Verifier(t2)
    d_vars = verifier_commit(verifier, d_coms)
    gadget_v = SetMembership(to_lc(member), None, instance_lcs, None)
    gadget_v.verify(verifier, [], d_vars)
    with pytest.raises((R1CSError, ProofError)):
        verifier.verify(proof, pc, bp)
