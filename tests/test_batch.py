"""Batched-witness proving (lang/batch.py) — the DP axis."""
import pytest

from bulletproof_gadgets_tpu.lang.batch import (prove_batch, verify_batch,
                                                warm_image_cache)
from bulletproof_gadgets_tpu.models import mimc
from bulletproof_gadgets_tpu.utils import rng
from bulletproof_gadgets_tpu.utils.conversions import scalar_to_be


@pytest.fixture(autouse=True)
def _seeded():
    rng.set_seed("batch")
    yield
    rng.set_seed(None)


def test_prove_batch_equality():
    gadgets = "EQUALS W0 W1\n"
    instance = ""
    witnesses = [
        "W0 = 0x2a\nW1 = 0x2a\n",
        "W0 = 0x1234\nW1 = 0x1234\n",
        "W0 = 0xdeadbeef\nW1 = 0xdeadbeef\n",
    ]
    results = prove_batch("batch_eq", instance, witnesses, gadgets)
    assert len(results) == 3
    proofs = {p for p, _, _ in results}
    assert len(proofs) == 3                        # distinct witnesses/blinds
    oks = verify_batch("batch_eq", instance,
                       [(p, c) for p, _, c in results], gadgets)
    assert oks == [True, True, True]


def test_prove_batch_negative_element():
    gadgets = "EQUALS W0 W1\n"
    witnesses = ["W0 = 0x2a\nW1 = 0x2a\n", "W0 = 0x2a\nW1 = 0x2b\n"]
    results = prove_batch("batch_eq", "", witnesses, gadgets)
    oks = verify_batch("batch_eq", "",
                       [(p, c) for p, _, c in results], gadgets)
    assert oks == [True, False]


def test_warm_image_cache_matches_host():
    mimc._image_cache.clear()
    data = [b"abc", b"x" * 40, b"abc"]
    n = warm_image_cache(data)
    assert n == 2                                  # deduplicated
    cached = dict(mimc._image_cache)
    mimc._image_cache.clear()
    for b in set(data):
        assert scalar_to_be(mimc.mimc_hash(b)) == scalar_to_be(cached[b])
    mimc._image_cache.clear()


@pytest.mark.slow
def test_prove_batch_hash_uses_device_images():
    """HASH statement batch: images come from the device kernel."""
    mimc._image_cache.clear()
    gadgets = "HASH W1 W0\n"
    wit = []
    for seed in (b"preimage-one!", b"another preimage value longer than 32b"):
        img = scalar_to_be(mimc.mimc_hash(seed))
        wit.append(f"W0 = 0x{seed.hex()}\nW1 = 0x{img.hex()}\n")
    results = prove_batch("batch_hash", "", wit, gadgets)
    assert mimc._image_cache                       # cache was seeded
    oks = verify_batch("batch_hash", "",
                       [(p, c) for p, _, c in results], gadgets)
    assert oks == [True, True]
    mimc._image_cache.clear()


def test_batch_lockstep_proofs_verify():
    """Lockstep-batched proofs (combined MSM launches across proofs) must
    all verify and be deterministic under a fixed seed.  Bytes differ from
    a sequential loop only through blinding draw ORDER (all witnesses
    prepare before any proves), so determinism is asserted batch-vs-batch.
    """
    from bulletproof_gadgets_tpu.lang.batch import prove_batch, verify_batch
    from bulletproof_gadgets_tpu.utils import rng

    name = "batchdet"
    gadgets = "BOUND W0 I0 I1"
    instance = "I0 = 0x00\nI1 = 0xffffffff\n"
    witnesses = [f"W0 = 0x{v:08x}\n" for v in (5, 77, 123456, 0xabcdef)]

    rng.set_seed("batch-det")
    batched = prove_batch(name, instance, witnesses, gadgets)
    rng.set_seed("batch-det")
    batched2 = prove_batch(name, instance, witnesses, gadgets)
    rng.set_seed(None)

    assert batched == batched2, "batched proving is not deterministic"
    oks = verify_batch(name, instance,
                       [(p, c) for p, _, c in batched], gadgets)
    assert oks == [True] * len(witnesses)


def test_batch_grouped_fused_ipa_verifies():
    """Force the device-table + fused-IPA path at small size so the
    lockstep driver's GROUPED cross-proof IPA rounds
    (ops/ipa_fused.create_batched via the "fused_ipa" request kind) run
    on CPU.  Regression for the drive-loop termination bug: a step with
    only IPA requests must resume the generators, not break."""
    from bulletproof_gadgets_tpu.core import msm as core_msm
    from bulletproof_gadgets_tpu.lang.batch import prove_batch, verify_batch
    from bulletproof_gadgets_tpu.utils import rng

    name = "batchipa"
    gadgets = "BOUND W0 I0 I1"
    instance = "I0 = 0x00\nI1 = 0xffff\n"
    witnesses = [f"W0 = 0x{v:04x}\n" for v in (5, 77, 1234)]

    old = core_msm._table_min_size
    core_msm.set_table_min_size(8)
    try:
        rng.set_seed("batch-ipa")
        batched = prove_batch(name, instance, witnesses, gadgets)
    finally:
        core_msm.set_table_min_size(old)
        rng.set_seed(None)
    oks = verify_batch(name, instance,
                       [(p, c) for p, _, c in batched], gadgets)
    assert oks == [True] * len(witnesses)


def test_prove_batch_mixed_shape_same_table():
    """Advisor r4 (low): witnesses whose circuits pad to the SAME table
    but differ in commitment count (3-limb vs 4-limb equality -> both
    round to 4 gens) reach create_batched with mismatching transcript
    metas; it must partition instead of asserting."""
    gadgets = "EQUALS W0 W1\n"
    w3 = "07" * 65                                 # 3 limbs
    w4 = "07" * 97                                 # 4 limbs
    witnesses = [
        f"W0 = 0x{w3}\nW1 = 0x{w3}\n",
        f"W0 = 0x{w4}\nW1 = 0x{w4}\n",
    ]
    results = prove_batch("batch_mix", "", witnesses, gadgets)
    oks = verify_batch("batch_mix", "",
                       [(p, c) for p, _, c in results], gadgets)
    assert oks == [True, True]
