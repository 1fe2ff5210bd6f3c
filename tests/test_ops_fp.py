"""Device F_p limb kernels vs the arbitrary-precision host oracle."""
import random

import numpy as np
import jax

from bulletproof_gadgets_tpu.ops import fp

P = fp.P
rnd = random.Random(1234)


def _rand_ints(n):
    vals = [rnd.randrange(P) for _ in range(n - 3)]
    return vals + [0, 1, P - 1]


def test_roundtrip():
    vals = _rand_ints(32)
    arr = fp.to_limbs_np(vals)
    assert fp.from_limbs(arr) == [v % P for v in vals]


def test_add_sub_mul():
    n = 64
    a = _rand_ints(n)
    b = list(reversed(_rand_ints(n)))
    da = fp.to_limbs_np(a)
    db = fp.to_limbs_np(b)

    add = jax.jit(fp.add)
    sub = jax.jit(fp.sub)
    mul = jax.jit(fp.mul)

    assert fp.from_limbs(add(da, db)) == [(x + y) % P for x, y in zip(a, b)]
    assert fp.from_limbs(sub(da, db)) == [(x - y) % P for x, y in zip(a, b)]
    assert fp.from_limbs(mul(da, db)) == [(x * y) % P for x, y in zip(a, b)]


def test_mul_small_and_chains():
    n = 16
    a = _rand_ints(n)
    da = fp.to_limbs_np(a)
    assert fp.from_limbs(fp.mul_small(da, 608)) == [x * 608 % P for x in a]
    # chain: ((a*a - a) + a) * a
    d = fp.mul(da, da)
    d = fp.sub(d, da)
    d = fp.add(d, da)
    d = fp.mul(d, da)
    assert fp.from_limbs(d) == [x * x % P * x % P for x in a]


def test_sub_underflow_heavy():
    # stress the signed-carry + conditional 2p path
    zero = fp.zeros((8,))
    vals = _rand_ints(8)
    d = fp.to_limbs_np(vals)
    neg = fp.sub(zero, d)
    assert fp.from_limbs(neg) == [(-v) % P for v in vals]
    # 0 - 0 == 0
    assert fp.from_limbs(fp.sub(zero, zero)) == [0] * 8
