"""Vectorized F_l ops (ops/flvec.py) vs arbitrary-precision oracle."""
import numpy as np
import jax.numpy as jnp

from bulletproof_gadgets_tpu.core.scalar import L
from bulletproof_gadgets_tpu.ops import flvec
from bulletproof_gadgets_tpu.ops.fl import mont_mul
from bulletproof_gadgets_tpu.ops.msm import signed_digits


def _rand_ints(n, seed=0, bits=252):
    rng = np.random.default_rng(seed)
    return [int.from_bytes(rng.bytes(32), "little") % (1 << bits)
            for _ in range(n)]


def test_limbs_roundtrip():
    vals = _rand_ints(100) + [0, 1, L - 1, L, (1 << 253) - 1]
    limbs = flvec.to_limbs(vals)
    back = flvec.limbs_to_ints(limbs)
    assert back == [v % L for v in vals]


def test_digits_from_limbs_matches_signed_digits():
    vals = [v % L for v in _rand_ints(200, seed=3)] + [0, 1, L - 1]
    limbs = flvec.to_limbs(vals)
    got = flvec.digits_from_limbs(limbs)
    want = signed_digits(vals, 8)
    assert np.array_equal(got, want)


def test_digits_noncanonical_representative():
    # a representative >= l must yield digits of the SAME group action
    v = (L + 12345) % (1 << 253)
    limbs = flvec.to_limbs([v])
    d = flvec.digits_from_limbs(limbs)
    # value reconstructed from digits == v (mod 2^256), so == v mod l too
    rec = sum(int(d[0, i]) << (8 * i) for i in range(32))
    assert rec % L == v % L


def test_add_sub():
    a = _rand_ints(64, 1)
    b = _rand_ints(64, 2)
    da, db = jnp.asarray(flvec.to_limbs(a)), jnp.asarray(flvec.to_limbs(b))
    assert flvec.limbs_to_ints(flvec.add(da, db)) == \
        [(x + y) % L for x, y in zip(a, b)]
    assert flvec.limbs_to_ints(flvec.sub(da, db)) == \
        [(x - y) % L for x, y in zip(a, b)]


def test_mont_mul_std_times_mont():
    a = _rand_ints(64, 5)
    u = _rand_ints(1, 6)[0]
    da = jnp.asarray(flvec.to_limbs(a))
    um = jnp.asarray(flvec.to_mont([u]))
    got = flvec.limbs_to_ints(mont_mul(da, um))
    assert got == [x * u % L for x in a]


def test_inner_product():
    a = _rand_ints(300, 7)
    b = _rand_ints(300, 8)
    da, db = jnp.asarray(flvec.to_limbs(a)), jnp.asarray(flvec.to_limbs(b))
    got = flvec.limbs_to_ints(flvec.inner(da, db))
    assert got == [sum(x * y for x, y in zip(a, b)) % L]


def test_sum_rows_large():
    # crosses the int32 chunking threshold logic
    a = _rand_ints(1 << 10, 9, bits=250)
    da = jnp.asarray(flvec.to_limbs(a))
    got = flvec.limbs_to_ints(flvec.sum_rows(da))
    assert got == [sum(a) % L]


def test_sub_then_mont_mul():
    # biased subtraction output must be a legal mont_mul operand
    a, b, u = _rand_ints(32, 10), _rand_ints(32, 11), _rand_ints(1, 12)[0]
    da, db = jnp.asarray(flvec.to_limbs(a)), jnp.asarray(flvec.to_limbs(b))
    um = jnp.asarray(flvec.to_mont([u]))
    got = flvec.limbs_to_ints(mont_mul(flvec.sub(da, db), um))
    assert got == [(x - y) * u % L for x, y in zip(a, b)]
