"""End-to-end prove -> verify over the reference's statement fixtures
(tests/resources/*.gadgets in the reference repo; CLI contract of
src/bin/prover.rs / verifier.rs).

The quick statements run in every test invocation; the heavyweight ones
(MiMC/Merkle/OR, thousands of multipliers) are marked `slow` and exercised
by scripts/run_all_statements.py + the benchmark harness.
"""
import os
import shutil

import pytest

RES = "/root/reference/tests/resources"

from bulletproof_gadgets_tpu.utils import rng
from bulletproof_gadgets_tpu.lang.prove import prove
from bulletproof_gadgets_tpu.lang.verify import verify


@pytest.fixture(autouse=True)
def _seeded():
    rng.set_seed("statement-tests")
    yield
    rng.set_seed(None)


def _read(name, ext):
    with open(os.path.join(RES, name + ext)) as f:
        return f.read()


def _roundtrip(name):
    instance = _read(name, ".inst")
    witness = _read(name, ".wtns")
    gadgets = _read(name, ".gadgets")
    coms = []
    proof, n_constraints = prove(name, instance, witness, gadgets, coms)
    assert n_constraints > 0
    ok = verify(name, instance, proof, "".join(coms), gadgets)
    assert ok, f"{name}: proof did not verify"
    return proof, coms, instance, gadgets


def test_equality_statement():
    _roundtrip("equality")


def test_inequality_statement():
    _roundtrip("inequality")


@pytest.mark.slow
def test_bounds_check_statement():
    # 256-bit ranges -> ~1536 multipliers; cheap on TPU, minutes on CPU
    _roundtrip("bounds_check")


def test_wrong_proof_rejected():
    name = "equality"
    instance = _read(name, ".inst")
    witness = _read(name, ".wtns")
    gadgets = _read(name, ".gadgets")
    coms = []
    proof, _ = prove(name, instance, witness, gadgets, coms)
    # flip one byte in the proof body
    bad = bytearray(proof)
    bad[64] ^= 1
    assert not verify(name, instance, bytes(bad), "".join(coms), gadgets)
    # wrong statement name (transcript domain) must fail
    assert not verify("other", instance, proof, "".join(coms), gadgets)


def test_tampered_commitments_rejected():
    name = "inequality"
    instance = _read(name, ".inst")
    witness = _read(name, ".wtns")
    gadgets = _read(name, ".gadgets")
    coms = []
    proof, _ = prove(name, instance, witness, gadgets, coms)
    # swap two commitment lines: transcript diverges -> reject
    coms2 = list(coms)
    coms2[0], coms2[1] = coms2[1], coms2[0]
    assert not verify(name, instance, proof, "".join(coms2), gadgets)


@pytest.mark.slow
def test_less_than_statement():
    _roundtrip("less_than")


@pytest.mark.slow
def test_set_membership_statement():
    _roundtrip("set_membership")


@pytest.mark.slow
def test_mimc_hash_statement():
    _roundtrip("mimc_hash")


@pytest.mark.slow
def test_merkle_tree_statement():
    _roundtrip("merkle_tree")


@pytest.mark.slow
@pytest.mark.parametrize("name", ["or", "or2", "or3", "or4", "or5"])
def test_or_statements(name):
    _roundtrip(name)


@pytest.mark.slow
def test_example_statement():
    name = "example"
    with open("/root/reference/example.inst") as f:
        instance = f.read()
    with open("/root/reference/example.wtns") as f:
        witness = f.read()
    with open("/root/reference/example.gadgets") as f:
        gadgets = f.read()
    coms = []
    proof, n = prove(name, instance, witness, gadgets, coms)
    assert verify(name, instance, proof, "".join(coms), gadgets)
