"""End-to-end prove -> verify round-trips over the raw R1CS layer (the
"SDK path", SURVEY.md §3.5), including negative cases and serialization."""
import pytest

from bulletproof_gadgets_tpu.core.scalar import Scalar
from bulletproof_gadgets_tpu.core.gens import PedersenGens, BulletproofGens
from bulletproof_gadgets_tpu.core.r1cs import Prover, Verifier, R1CSError
from bulletproof_gadgets_tpu.core.proof import R1CSProof
from bulletproof_gadgets_tpu.core.transcript import ProofError
from bulletproof_gadgets_tpu.utils.merlin import Transcript
from bulletproof_gadgets_tpu.utils import rng


@pytest.fixture(autouse=True)
def _seeded():
    rng.set_seed("test")
    yield
    rng.set_seed(None)


def _range_proof(cs, x_lc, n, x_assignment):
    """utils.rs:5-35 semantics: x in [0, 2^n)."""
    exp_2 = Scalar.one()
    x_bytes = x_assignment.as_bytes() if x_assignment is not None else None
    for i in range(n):
        if x_bytes is not None:
            offset = i // 8
            bit = (x_bytes[offset] >> (i - offset * 8)) & 1
            assignment = (Scalar.from_int(1 - bit), Scalar.from_int(bit))
        else:
            assignment = None
        a, b, o = cs.allocate_multiplier(assignment)
        cs.constrain(o.lc())
        cs.constrain(a + (b - 1))
        x_lc = x_lc - b * exp_2
        exp_2 = exp_2 + exp_2
    cs.constrain(x_lc)


def _prove_range(value: int, n: int, constrain_n: int = None):
    pc = PedersenGens.default()
    bp = BulletproofGens(256, 1)
    x = Scalar.from_int(value)
    t = Transcript(b"RangeProof")
    prover = Prover(pc, t)
    com, var = prover.commit(x, rng.random_scalar())
    _range_proof(prover, var.lc(), n, x)
    proof = prover.prove(bp)
    return pc, bp, com, proof, constrain_n if constrain_n else n


def _verify_range(pc, bp, com, proof, n) -> bool:
    t = Transcript(b"RangeProof")
    verifier = Verifier(t)
    var = verifier.commit(com)
    _range_proof(verifier, var.lc(), n, None)
    try:
        verifier.verify(proof, pc, bp)
        return True
    except (R1CSError, ProofError):
        return False


def test_range_proof_ok():
    pc, bp, com, proof, n = _prove_range(0x0522A64D7B931E, 56)
    assert _verify_range(pc, bp, com, proof, n)


def test_range_proof_value_too_big_fails():
    # 56-bit value proven against a 48-bit circuit must fail
    # (mirrors utils.rs test_range_proof_2).
    pc, bp, com, proof, n = _prove_range(0x0522A64D7B931E, 48)
    assert not _verify_range(pc, bp, com, proof, n)


def test_proof_serialization_roundtrip():
    pc, bp, com, proof, n = _prove_range(1234, 16)
    raw = proof.to_bytes()
    assert raw[0] == 0  # one-phase version byte
    proof2 = R1CSProof.from_bytes(raw)
    assert proof2.to_bytes() == raw
    assert _verify_range(pc, bp, com, proof2, n)


def test_corrupted_proof_fails():
    pc, bp, com, proof, n = _prove_range(77, 8)
    raw = bytearray(proof.to_bytes())
    raw[40] ^= 1
    try:
        proof2 = R1CSProof.from_bytes(bytes(raw))
        ok = _verify_range(pc, bp, com, proof2, n)
    except (ProofError, R1CSError):
        ok = False
    assert not ok


def test_multiply_and_committed_vars():
    # prove knowledge of committed v with v*v = 49 via multiply()
    pc = PedersenGens.default()
    bp = BulletproofGens(8, 1)
    t = Transcript(b"MulTest")
    prover = Prover(pc, t)
    v = Scalar.from_int(7)
    com, var = prover.commit(v, rng.random_scalar())
    _, _, o = prover.multiply(var.lc(), var.lc())
    prover.constrain(o - Scalar.from_int(49))
    proof = prover.prove(bp)

    t2 = Transcript(b"MulTest")
    verifier = Verifier(t2)
    var2 = verifier.commit(com)
    _, _, o2 = verifier.multiply(var2.lc(), var2.lc())
    verifier.constrain(o2 - Scalar.from_int(49))
    verifier.verify(proof, pc, bp)  # should not raise

    # wrong public square fails
    t3 = Transcript(b"MulTest")
    verifier = Verifier(t3)
    var3 = verifier.commit(com)
    _, _, o3 = verifier.multiply(var3.lc(), var3.lc())
    verifier.constrain(o3 - Scalar.from_int(50))
    with pytest.raises((R1CSError, ProofError)):
        verifier.verify(proof, pc, bp)
