"""The reference's in-module gadget test matrix, ported case by case.

Byte vectors are extracted verbatim from the reference sources (cited per
test family); each case runs the FULL pipeline — commit -> setup -> prove ->
prover.prove -> verifier_commit -> verify -> verifier.verify — exactly like
the reference's #[cfg(test)] suites (SURVEY.md §4).

Cases with range-proof or MiMC circuits (hundreds to thousands of
multipliers) are slow-marked: the quick CPU suite keeps the small ones, the
TPU run (BPG_TPU_TESTS_ON_TPU=1 pytest -m slow) covers the rest.
"""
import os

import pytest

from bulletproof_gadgets_tpu.core.gens import PedersenGens, BulletproofGens
from bulletproof_gadgets_tpu.core.r1cs import Prover, Verifier, R1CSError
from bulletproof_gadgets_tpu.core.transcript import ProofError
from bulletproof_gadgets_tpu.core.commitments import (commit,
                                                      commit_all_single,
                                                      verifier_commit)
from bulletproof_gadgets_tpu.core.lc import to_lc
from bulletproof_gadgets_tpu.core.recorder import RecordingCS
from bulletproof_gadgets_tpu.utils.merlin import Transcript
from bulletproof_gadgets_tpu.utils.conversions import (be_to_scalar,
                                                       be_to_scalars)
from bulletproof_gadgets_tpu.utils import rng
from bulletproof_gadgets_tpu.models.less_than import LessThan
from bulletproof_gadgets_tpu.models.inequality import Inequality
from bulletproof_gadgets_tpu.models.mimc_hash_gadget import MimcHash256
from bulletproof_gadgets_tpu.models.merkle_tree import MerkleTree256, Hash, W, I
from bulletproof_gadgets_tpu.models.mimc import mimc_hash
from bulletproof_gadgets_tpu.models.or_conjunction import or_gadget


@pytest.fixture(autouse=True)
def _seeded():
    rng.set_seed("ref-units")
    yield
    rng.set_seed(None)


def _verify(verifier, proof, pc, bp) -> bool:
    try:
        verifier.verify(proof, pc, bp)
        return True
    except (R1CSError, ProofError):
        return False


# ---------------------------------------------------------------------------
# less_than — reference src/less_than/less_than_gadget.rs:96-334

def _less_than_case(left_hex, right_hex, expect_ok):
    left = be_to_scalar(bytes.fromhex(left_hex))
    right = be_to_scalar(bytes.fromhex(right_hex))
    pc = PedersenGens.default()
    bp = BulletproofGens(1024, 1)

    t = Transcript(b"LessThan")
    prover = Prover(pc, t)
    gadget = LessThan(to_lc(left), left, to_lc(right), right)
    d_coms, d_wtns = gadget.setup(prover, [])
    gadget.prove(prover, [], d_wtns)
    proof = prover.prove(bp)

    t2 = Transcript(b"LessThan")
    verifier = Verifier(t2)
    d_vars = verifier_commit(verifier, d_coms)
    gadget.verify(verifier, [], d_vars)
    assert _verify(verifier, proof, pc, bp) == expect_ok


_LT = "0522a64d7b931e21760cf955a15fcc"
_GT = "aa22a64d7b931e21760cf955a15fcc"
_MAX = "3fffffffffffffffffffffffffffffff"          # 2^126 - 1
_MAX1 = "3ffffffffffffffffffffffffffffffe"         # 2^126 - 2


@pytest.mark.slow
def test_less_than_gadget_1():
    _less_than_case(_LT, _GT, True)                # generic happy case


@pytest.mark.slow
def test_less_than_gadget_2():
    _less_than_case(_GT, _LT, False)               # swapped


@pytest.mark.slow
def test_less_than_gadget_3():
    _less_than_case(_MAX1, _MAX, True)             # boundary values


@pytest.mark.slow
def test_less_than_gadget_4():
    _less_than_case(_MAX, _MAX1, False)            # boundary swapped


@pytest.mark.slow
def test_less_than_gadget_5():
    _less_than_case("00", "00", False)             # equal: zero


@pytest.mark.slow
def test_less_than_gadget_6():
    _less_than_case(_MAX, _MAX, False)             # equal: 2^126 - 1


# ---------------------------------------------------------------------------
# inequality — reference src/inequality/inequality_gadget.rs:126-420

def _inequality_case(left_hex, right_hex, gens, expect_ok):
    left_bytes = bytes.fromhex(left_hex)
    right = be_to_scalars(bytes.fromhex(right_hex))
    right_lcs = [to_lc(s) for s in right]
    pc = PedersenGens.default()
    bp = BulletproofGens(gens, 1)

    t = Transcript(b"Inequality")
    prover = Prover(pc, t)
    gadget = Inequality(right_lcs, right)
    scalars, coms, variables = commit(prover, left_bytes)
    d_coms, d_wtns = gadget.setup(prover, scalars)
    gadget.prove(prover, variables, d_wtns)
    proof = prover.prove(bp)

    t2 = Transcript(b"Inequality")
    verifier = Verifier(t2)
    w_vars = verifier_commit(verifier, coms)
    d_vars = verifier_commit(verifier, d_coms)
    gadget.verify(verifier, w_vars, d_vars)
    assert _verify(verifier, proof, pc, bp) == expect_ok


_INEQ_A = ("0522a64d7b931e21760cf955a15fcc733e8a52b42a56ab03"
           "afddec8beb668749")
_INEQ_B = ("0522a64d7b931e21760cf955a15fcc793e8a52b42a56ab03"
           "afddec8beb668749")
_INEQ_SHORT = ("0522a64d7b931e21760cf955a15fcc793e8a52b42a56ab03"
               "afddec8beb6687")
_INEQ_FF = "ff" * 32
_INEQ_MIX = ("0522a64d7b931e213e8a52b42a56ab030522a64d7b931e21"
             "3e8a52b42a56ab03760cf955a15fcc790522a64d7b931e")


def test_inequality_gadget_1():
    # three-limb values differing in two limbs
    right = ("0522a64d7b931e21760cf955a15fcc733e8a52b42a56ab03afddec8beb668749"
             "0522a64d7b931e21760cf955a15fcc793e8a52b42a56ab02afddec8beb668749"
             "0522a64d7b931e21760cf955a15fcc793e8a52b42a56ab03afddec8ceb668749")
    left = ("0522a64d7b931e21760cf955a15fcc793e8a52b42a56ab03afddec8beb668749"
            "0522a64d7b931e21760cf955a15fcc793e8a52b42a56ab03afddec8beb668749"
            "0522a64d7b931e21760cf955a15fcc793e8a52b42a56ab03afddec8ceb668749")
    _inequality_case(left, right, 8, True)


def test_inequality_gadget_2():
    _inequality_case(_INEQ_B, _INEQ_A, 4, True)


def test_inequality_gadget_3():
    _inequality_case(_INEQ_SHORT, _INEQ_FF, 4, True)


def test_inequality_gadget_4():
    _inequality_case(_INEQ_FF, _INEQ_SHORT, 4, True)


def test_inequality_gadget_5():
    # equal values -> sum of deltas is zero -> proof must NOT verify
    _inequality_case(_INEQ_A, _INEQ_A, 4, False)


def test_inequality_gadget_6():
    _inequality_case(_INEQ_MIX, _INEQ_SHORT, 4, True)


def test_inequality_gadget_7():
    _inequality_case(_INEQ_SHORT, _INEQ_MIX, 4, True)


# ---------------------------------------------------------------------------
# mimc_hash gadget — reference src/mimc_hash/mimc_hash_gadget.rs:162-273

def _mimc_case(preimage_hex, gens):
    preimage = bytes.fromhex(preimage_hex)
    image = mimc_hash(preimage)
    pc = PedersenGens.default()
    bp = BulletproofGens(gens, 1)

    t = Transcript(b"MiMCHash")
    prover = Prover(pc, t)
    gadget = MimcHash256(to_lc(image))
    scalars, coms, variables = commit(prover, preimage)
    d_coms, d_wtns = gadget.setup(prover, scalars)
    gadget.prove(prover, variables, d_wtns)
    proof = prover.prove(bp)

    t2 = Transcript(b"MiMCHash")
    verifier = Verifier(t2)
    w_vars = verifier_commit(verifier, coms)
    d_vars = verifier_commit(verifier, d_coms)
    gadget.verify(verifier, w_vars, d_vars)
    assert _verify(verifier, proof, pc, bp)


_PRE_1 = "38535450433043546f313877615a6a423663"               # 18 bytes
_PRE_2 = ("54686520717569636b2062726f776e20666f78206a756d7073"
          "206f7665722074")                                    # 32 bytes
_PRE_3 = ("546865207175694a76077d4a40bd91551b3a03b1ad8adb2b66"
          "6f78206a756d70666f78206a756d7073206f7665")          # 45 bytes


# reference images for the same preimages (mimc_hash_gadget.rs:170-245);
# also pins our native mimc_hash against the reference vectors
_IMAGES = {
    _PRE_1: "0d2203069ac15f58172bae1b3af98d8982deef9df37482c1a920b8832ee813a4",
    _PRE_2: "01245409f28ae2f076077d4a40bd91551b3a03b1ad8adb2b1da116d29c60a85c",
    _PRE_3: "0fcb21fbf23b968dee8f6b3a511e93e8c5c0eb2f71aa0601111f911c9e42cf06",
}


def test_mimc_images_match_reference_vectors():
    for pre, img in _IMAGES.items():
        from bulletproof_gadgets_tpu.utils.conversions import scalar_to_be
        assert scalar_to_be(mimc_hash(bytes.fromhex(pre))).hex() == img


@pytest.mark.slow
def test_mimc_hash_gadget_1():
    _mimc_case(_PRE_1, 1024)


@pytest.mark.slow
def test_mimc_hash_gadget_2():
    _mimc_case(_PRE_2, 2048)


@pytest.mark.slow
def test_mimc_hash_gadget_3():
    _mimc_case(_PRE_3, 2048)


# ---------------------------------------------------------------------------
# merkle_tree — reference src/merkle_tree/merkle_tree_gadget.rs:218-545

_MW = {
    1: "0522a64d7b931e21760cf955a15fcc793e8a52b42a56ab03afddec8beb668749",
    2: "07faf8aaa21077200a11576b1cdb402f52a47f192b36998b4da25807a9be52f5",
    3: "09243333e374e76e4975ab48ae38241ba67805cd60f1523e9b79a48daac9a84d",
    4: "0258647e47e8005748d4e7d0d76b230cc20f2a0f8745eee2bccced0c2add59d5",
    5: "011c6fc7f15087f4d3e97e672813af066f74f60446bc75aa85eb2d6db8ae791b",
    6: "0f8653b7e734422fc75bdb4eb1bc774cd34f9ab3a89545e021016a4d9171a902",
    7: "0bd752eb80bfa5189bade1cc8f49cf5fe1843e1ff736367afc52670e429d1c36",
    8: "181c63cfc823a477b0825004475222e1c7d060179b6b247ffa5adc58e307de0d",
    9: "2ad84a04eb9394e0cc4b4b478f211a815f2707597c6032a98a573fbdee4a3109",
    10: "c45a435f3c401eeb6d3a08b2f93669ee33e4ad2640e4e9a9a34937006ae8b308",
    11: "acb33246c69545225a61fb60b44868e8bc8d25533c663aacabe449686bbed40c",
    12: "7f7eba68d7be6b7076c17b6dc473a6d1770bcf1cb4266e7fb1e4642658050609",
    13: "a84d1ceceb0ebc710ba2bc5ae60bb6c38abad15f650bf7e87cb901533125110d",
    14: "157cdbdece96312986c9f44e03c232d4ca9aad55e4e259828f1ac451a93dd40a",
    15: "a32f318c922b6404d6dd8eb2f65a73b05a49f14cb0b13f4828a840079e60460d",
}


def _merkle_case(pattern, witness_ids, instance_ids, gens=16384,
                 root_id=1):
    root = be_to_scalar(bytes.fromhex(_MW[root_id]))
    witnesses = [bytes.fromhex(_MW[i]) for i in witness_ids]
    instance_lcs = [to_lc(be_to_scalar(bytes.fromhex(_MW[i])))
                    for i in instance_ids]
    pc = PedersenGens.default()
    bp = BulletproofGens(gens, 1)

    t = Transcript(b"MerkleTree")
    prover = Prover(pc, t)
    _, coms, variables = commit_all_single(prover, witnesses)
    gadget = MerkleTree256(to_lc(root), instance_lcs,
                           [v.lc() for v in variables], pattern)
    gadget.prove(prover, [], [])
    proof = prover.prove(bp)

    t2 = Transcript(b"MerkleTree")
    verifier = Verifier(t2)
    w_vars = verifier_commit(verifier, coms)
    gadget_v = MerkleTree256(to_lc(root), instance_lcs,
                             [v.lc() for v in w_vars], pattern)
    gadget_v.verify(verifier, w_vars, [])
    assert _verify(verifier, proof, pc, bp)


@pytest.mark.slow
def test_merkle_tree_gadget_1():
    pattern = Hash(Hash(Hash(W, W), Hash(W, W)), Hash(Hash(W, W), Hash(W, W)))
    _merkle_case(pattern, [8, 9, 10, 11, 12, 13, 14, 15], [])


@pytest.mark.slow
def test_merkle_tree_gadget_2():
    pattern = Hash(Hash(Hash(W, W), Hash(I, W)), Hash(Hash(I, W), Hash(W, I)))
    _merkle_case(pattern, [8, 9, 11, 13, 14], [10, 12, 15])


@pytest.mark.slow
def test_merkle_tree_gadget_3():
    pattern = Hash(Hash(Hash(W, W), Hash(W, W)), Hash(W, W))
    _merkle_case(pattern, [8, 9, 10, 11, 6, 7], [])


@pytest.mark.slow
def test_merkle_tree_gadget_4():
    pattern = Hash(Hash(Hash(W, W), Hash(W, W)), W)
    _merkle_case(pattern, [8, 9, 10, 11, 3], [])


@pytest.mark.slow
def test_merkle_tree_gadget_5():
    pattern = Hash(Hash(W, W), Hash(Hash(W, W), Hash(W, W)))
    _merkle_case(pattern, [4, 5, 12, 13, 14, 15], [])


@pytest.mark.slow
def test_merkle_tree_gadget_6():
    pattern = Hash(W, Hash(Hash(W, W), Hash(W, W)))
    _merkle_case(pattern, [2, 12, 13, 14, 15], [])


@pytest.mark.slow
@pytest.mark.skipif(os.environ.get("BPG_RUN_512") != "1",
                    reason="2^20-gens stress test (reference #[ignore]; "
                           "set BPG_RUN_512=1, run on TPU)")
def test_merkle_tree_gadget_512():
    # reference merkle_tree_gadget.rs:474-545 (512 identical W1 leaves)
    root = be_to_scalar(bytes.fromhex(
        "038c137beec8e2edfb5c48cbd063f04e569139d2221a4eb7befb85aa1bf8ba40"))
    pat = Hash(W, W)
    for _ in range(8):
        pat = Hash(pat, pat)                       # 512 leaves
    witnesses = [bytes.fromhex(_MW[1])] * 512
    pc = PedersenGens.default()
    bp = BulletproofGens(1048576, 1)
    t = Transcript(b"MerkleTree")
    prover = Prover(pc, t)
    _, coms, variables = commit_all_single(prover, witnesses)
    gadget = MerkleTree256(to_lc(root), [],
                           [v.lc() for v in variables], pat)
    gadget.prove(prover, [], [])
    proof = prover.prove(bp)
    t2 = Transcript(b"MerkleTree")
    verifier = Verifier(t2)
    w_vars = verifier_commit(verifier, coms)
    gadget_v = MerkleTree256(to_lc(root), [], [v.lc() for v in w_vars], pat)
    gadget_v.verify(verifier, w_vars, [])
    assert _verify(verifier, proof, pc, bp)


# ---------------------------------------------------------------------------
# or conjunction — reference src/or/or_conjunction.rs:84-190

@pytest.mark.slow
def test_or_conjunction_1():
    """Three HASH clauses ORed; all three satisfied (as in the reference)."""
    preimages = [bytes.fromhex(h) for h in (_PRE_1, _PRE_3, _PRE_2)]
    images = [mimc_hash(p) for p in preimages]
    pc = PedersenGens.default()
    bp = BulletproofGens(8192, 1)

    t = Transcript(b"MiMCHash")
    prover = Prover(pc, t)
    recorder = RecordingCS(prover_mode=True)
    clause_data = []
    for pre, img in zip(preimages, images):
        gadget = MimcHash256(to_lc(img))
        scalars, coms, variables = commit(prover, pre)
        d_coms, d_wtns = gadget.setup(prover, scalars)
        gadget.prove(recorder, variables, d_wtns)
        recorder.rewind()
        clause_data.append((img, coms, d_coms))
    main = RecordingCS(prover_mode=True)
    or_gadget(main, recorder)
    main.replay_into(prover)
    proof = prover.prove(bp)

    t2 = Transcript(b"MiMCHash")
    verifier = Verifier(t2)
    v_recorder = RecordingCS(prover_mode=False)
    for img, coms, d_coms in clause_data:
        w_vars = verifier_commit(verifier, coms)
        d_vars = verifier_commit(verifier, d_coms)
        gadget = MimcHash256(to_lc(img))
        gadget.verify(v_recorder, w_vars, d_vars)
        v_recorder.rewind()
    v_main = RecordingCS(prover_mode=False)
    or_gadget(v_main, v_recorder)
    v_main.replay_into(verifier)
    assert _verify(verifier, proof, pc, bp)


# ---------------------------------------------------------------------------
# set_membership — reference src/set_membership/set_membership_gadget.rs:176-404
# (VALUE1..VALUE5 byte vectors verbatim from :143-174)

from bulletproof_gadgets_tpu.models.set_membership import SetMembership
from bulletproof_gadgets_tpu.models.equality import Equality
from bulletproof_gadgets_tpu.core.commitments import commit_single

_V1 = bytes.fromhex("0522a64d7b931e21760cf955a15fcc79"
                    "3e8a52b42a56ab03afddec8beb668749")
_V2 = bytes.fromhex("07faf8aaa21077200a11576b1cdb402f"
                    "52a47f192b36998b4da25807a9be52f5")
_V3 = bytes.fromhex("09243333e374e76e4975ab48ae38241b"
                    "a67805cd60f1523e9b79a48daac9a84d")
_V4 = bytes.fromhex("0258647e47e8005748d4e7d0d76b230c"
                    "c20f2a0f8745eee2bccced0c2add59d5")
_V5 = bytes.fromhex("011c6fc7f15087f4d3e97e672813af06"
                    "6f74f60446bc75aa85eb2d6db8ae791b")


def _set_membership_case(witness_value, witness_set, instance_set_bytes,
                         expect_ok):
    instance_set = [be_to_scalar(b) for b in instance_set_bytes]
    instance_lcs = [to_lc(s) for s in instance_set]
    pc = PedersenGens.default()
    bp = BulletproofGens(64, 1)

    t = Transcript(b"SetMembership")
    prover = Prover(pc, t)
    w_scalar, w_com, w_var = commit_single(prover, witness_value)
    gadget = SetMembership(w_var.lc(), w_scalar, instance_lcs, instance_set)
    ws_scalars, ws_coms, ws_vars = commit_all_single(prover, witness_set)
    d_coms, d_wtns = gadget.setup(prover, ws_scalars)
    gadget.prove(prover, ws_vars, d_wtns)
    proof = prover.prove(bp)

    t2 = Transcript(b"SetMembership")
    verifier = Verifier(t2)
    w_vars = verifier_commit(verifier, [w_com])
    gadget_v = SetMembership(w_vars[0].lc(), None, instance_lcs, None)
    ws_vars_v = verifier_commit(verifier, ws_coms)
    d_vars = verifier_commit(verifier, d_coms)
    gadget_v.verify(verifier, ws_vars_v, d_vars)
    assert _verify(verifier, proof, pc, bp) == expect_ok


def test_set_membership_gadget_1():
    # instance-only set (set_membership_gadget.rs:176)
    _set_membership_case(_V1, [], [_V4, _V3, _V1, _V5, _V2], True)


def test_set_membership_gadget_2():
    # mixed set (rs:221)
    _set_membership_case(_V1, [_V3, _V5, _V1], [_V4, _V2], True)


def test_set_membership_gadget_3():
    # mixed set, value not a member (rs:259)
    _set_membership_case(_V1, [_V3, _V5], [_V4, _V2], False)


def test_set_membership_gadget_4():
    # mixed set with a zero witness, value not a member (rs:297)
    _set_membership_case(_V1, [_V3, _V5, b"\x00", _V2], [_V4, _V2], False)


def test_set_membership_gadget_5():
    # value contained twice -> one-hot sum = 2 -> unsatisfiable (rs:337)
    _set_membership_case(_V1, [_V3, _V1, _V5], [_V4, _V2, _V1], False)


def test_set_membership_gadget_6():
    # zero member matches the zero witness element (rs:379)
    _set_membership_case(b"\x00", [_V3, _V5, b"\x00", _V1], [_V4, _V2], True)


# ---------------------------------------------------------------------------
# equality — reference src/equality/equality_gadget.rs:52-198 (byte vectors
# verbatim; cases 1-3 overlap tests/test_gadget_units.py's generic ones but
# pin the reference's exact values, case 4 covers prove() with no derived
# witnesses at all)

_EQ = _V1
_EQ_DIFF = bytes.fromhex("0522a64d7b931e21760cf95aa15fcc79"
                         "3e8a52b42a56ab03afddec8beb668749")
_EQ_LONG = _V1 + bytes.fromhex("3e8a52b42a56ab03afddec8beb668749")
_EQ_LONG2 = bytes.fromhex("0522a64d7b931e21760cf955a15fcc79"
                          "3e8a52b42a56ab03afddec8beb668749"
                          "3e8a52032a56ab03afddec8beb668749")


def _equality_case(left_bytes, right_bytes, gens, expect_ok,
                   with_setup=True):
    right = [to_lc(s) for s in be_to_scalars(right_bytes)]
    pc = PedersenGens.default()
    bp = BulletproofGens(gens, 1)

    t = Transcript(b"Equality")
    prover = Prover(pc, t)
    gadget = Equality(right)
    scalars, w_coms, w_vars = commit(prover, left_bytes)
    if with_setup:
        d_coms, d_wtns = gadget.setup(prover, scalars)
    else:
        d_coms, d_wtns = [], []
    gadget.prove(prover, w_vars, d_wtns)
    proof = prover.prove(bp)

    t2 = Transcript(b"Equality")
    verifier = Verifier(t2)
    w_vars_v = verifier_commit(verifier, w_coms)
    d_vars = verifier_commit(verifier, d_coms)
    gadget.verify(verifier, w_vars_v, d_vars)
    assert _verify(verifier, proof, pc, bp) == expect_ok


def test_equality_gadget_ref_1():
    _equality_case(_EQ, _EQ, 1, True)


def test_equality_gadget_ref_2():
    _equality_case(_EQ_DIFF, _EQ, 1, False)


def test_equality_gadget_ref_3():
    # left 1 limb vs right 2 limbs -> 1 = 0 poison (equality_gadget.rs:87)
    _equality_case(bytes.fromhex("0522a64d7b931e21"), _EQ_LONG, 2, False)


def test_equality_gadget_ref_4():
    # no setup / no derived witnesses at all (equality_gadget.rs:123)
    _equality_case(_EQ_LONG2, _EQ_LONG2, 2, True, with_setup=False)
