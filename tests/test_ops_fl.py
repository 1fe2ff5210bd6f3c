"""Device F_l Montgomery kernels + batched MiMC vs host oracles."""
import random

import jax.numpy as jnp

from bulletproof_gadgets_tpu.core.scalar import L
from bulletproof_gadgets_tpu.ops import fl
from bulletproof_gadgets_tpu.ops.mimc_kernels import mimc_hash_batch
from bulletproof_gadgets_tpu.models.mimc import mimc_hash
from bulletproof_gadgets_tpu.utils.conversions import scalar_to_be

rnd = random.Random(21)


def test_mont_mul_and_add():
    n = 48
    a = [rnd.randrange(L) for _ in range(n - 2)] + [0, L - 1]
    b = [rnd.randrange(L) for _ in range(n - 2)] + [L - 1, L - 1]
    da = jnp.asarray(fl.to_mont_np(a))
    db = jnp.asarray(fl.to_mont_np(b))
    got = fl.from_mont(fl.mont_mul(da, db))
    assert got == [(x * y) % L for x, y in zip(a, b)]
    got_add = fl.from_mont(fl.add(da, db))
    assert got_add == [(x + y) % L for x, y in zip(a, b)]


def test_mont_mul_chain():
    # x^9 via repeated squaring/cubing exercises lazy-value growth
    n = 8
    a = [rnd.randrange(L) for _ in range(n)]
    d = jnp.asarray(fl.to_mont_np(a))
    sq = fl.mont_mul(d, d)
    cube = fl.mont_mul(sq, d)
    nine = fl.mont_mul(fl.mont_mul(cube, cube), cube)
    assert fl.from_mont(nine) == [pow(x, 9, L) for x in a]


def test_mimc_device_vs_host():
    preimages = [
        bytes([0x38, 0x53, 0x54, 0x50, 0x43, 0x30, 0x43, 0x54,
               0x6f, 0x31, 0x38, 0x77, 0x61, 0x5a, 0x6a, 0x42, 0x36, 0x63]),
        b"The quick brown fox jumps over t",
        b"a" * 96,          # 3 blocks
        b"\x00" * 32,       # zero block edge case
        bytes(range(64)),
    ]
    got = mimc_hash_batch(preimages)
    for data, image in zip(preimages, got):
        assert scalar_to_be(image) == scalar_to_be(mimc_hash(data)), data
