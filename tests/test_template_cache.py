"""Circuit-template cache (lang/template): a cache hit must produce
byte-identical proofs under seeded blindings, and correct proofs for NEW
witness values (the cached multiplier programs + bit recipes re-evaluate
against the fresh commitments)."""
import pytest

from bulletproof_gadgets_tpu.utils import rng
from bulletproof_gadgets_tpu.lang.prove import prove
from bulletproof_gadgets_tpu.lang.verify import verify
from bulletproof_gadgets_tpu.lang import template

RES = "/root/reference/tests/resources"


@pytest.fixture(autouse=True)
def _fresh():
    template.prover_cache.d.clear()
    template.verifier_cache.d.clear()
    yield
    rng.set_seed(None)


def _read(name, ext):
    with open(f"{RES}/{name}{ext}") as f:
        return f.read()


@pytest.mark.parametrize("name", ["inequality", "or3"])
def test_hit_reproduces_bytes(name):
    inst, wtns, gadg = (_read(name, e) for e in (".inst", ".wtns",
                                                 ".gadgets"))
    rng.set_seed("tmpl")
    coms1 = []
    p1, n1 = prove(name, inst, wtns, gadg, coms1)       # miss (builds)
    rng.set_seed("tmpl")
    coms2 = []
    p2, n2 = prove(name, inst, wtns, gadg, coms2)       # hit
    assert (p1, n1, coms1) == (p2, n2, coms2)
    assert verify(name, inst, p2, "".join(coms2), gadg)


def test_hit_with_new_witness_bits_recipe():
    # tiny BOUND statement (1-byte range -> 8-bit range proofs) exercises
    # the allocate_multiplier bit recipes on the hit path
    gadg = "BOUND W0 I0 I1"
    inst = "I0 = 0x0a\nI1 = 0x64\n"

    rng.set_seed("tmpl-b1")
    coms = []
    proof, _ = prove("b", inst, "W0 = 0x43\n", gadg, coms)   # miss
    assert verify("b", inst, proof, "".join(coms), gadg)

    # same shape, new value -> cache hit with fresh bit assignments
    rng.set_seed("tmpl-b2")
    coms = []
    proof, _ = prove("b", inst, "W0 = 0x17\n", gadg, coms)
    assert verify("b", inst, proof, "".join(coms), gadg)

    # out-of-range witness on the hit path -> proof must NOT verify
    rng.set_seed("tmpl-b3")
    coms = []
    proof, _ = prove("b", inst, "W0 = 0x65\n", gadg, coms)
    assert not verify("b", inst, proof, "".join(coms), gadg)


def test_hit_with_new_witness_inequality():
    name = "inequality"
    inst, wtns, gadg = (_read(name, e) for e in (".inst", ".wtns",
                                                 ".gadgets"))
    rng.set_seed("tmpl-i1")
    coms = []
    proof, _ = prove(name, inst, wtns, gadg, coms)
    assert verify(name, inst, proof, "".join(coms), gadg)
    # flip some witness bytes, keep lengths (same shape -> hit)
    lines = []
    for line in wtns.splitlines():
        if line.strip():
            k, _, v = line.partition("=")
            v = v.strip()
            body = v[2:]
            flipped = ("%0" + str(len(body)) + "x") % (
                int(body, 16) ^ 0x5a)
            lines.append(f"{k.strip()} = 0x{flipped}")
    wtns2 = "\n".join(lines) + "\n"
    rng.set_seed("tmpl-i2")
    coms = []
    proof, _ = prove(name, inst, wtns2, gadg, coms)
    assert verify(name, inst, proof, "".join(coms), gadg)


def test_shape_change_is_a_miss():
    # different witness LENGTH must not hit the cached template
    gadg = "EQUALS W0 W1"
    rng.set_seed("tmpl-s")
    coms = []
    proof, _ = prove("e", "", "W0 = 0x07\nW1 = 0x07\n", gadg, coms)
    assert verify("e", "", proof, "".join(coms), gadg)
    coms = []
    w2 = "W0 = 0x" + "07" * 40 + "\nW1 = 0x" + "07" * 40 + "\n"
    proof, _ = prove("e", "", w2, gadg, coms)
    assert verify("e", "", proof, "".join(coms), gadg)


def test_build_time_value_collision_binds_by_identity():
    # Advisor r4 (high): two committed scalars EQUAL at template-build
    # time must not cross-bind bit recipes.  Build the template from a
    # witness where W0 == W1, then hit the cache with W0 != W1 — a
    # value-keyed slot map would extract W1's bits from W0's slot and
    # emit an invalid proof.
    gadg = "BOUND W0 I0 I1\nBOUND W1 I0 I1"
    inst = "I0 = 0x0a\nI1 = 0x64\n"

    rng.set_seed("tmpl-c1")
    coms = []
    proof, _ = prove("c", inst, "W0 = 0x43\nW1 = 0x43\n", gadg, coms)
    assert verify("c", inst, proof, "".join(coms), gadg)

    rng.set_seed("tmpl-c2")
    coms = []
    proof, _ = prove("c", inst, "W0 = 0x17\nW1 = 0x60\n", gadg, coms)
    assert verify("c", inst, proof, "".join(coms), gadg)

    # and the hit path must still catch an out-of-range second witness
    rng.set_seed("tmpl-c3")
    coms = []
    proof, _ = prove("c", inst, "W0 = 0x17\nW1 = 0x65\n", gadg, coms)
    assert not verify("c", inst, proof, "".join(coms), gadg)
