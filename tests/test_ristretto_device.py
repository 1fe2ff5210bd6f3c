"""Device Ristretto compression + F_l challenge math vs host oracles."""
import random

import numpy as np
import jax
import jax.numpy as jnp

from bulletproof_gadgets_tpu.core.ristretto import (RistrettoPoint, P,
                                                    RISTRETTO_BASEPOINT)
from bulletproof_gadgets_tpu.core.scalar import L
from bulletproof_gadgets_tpu.ops import fp, flvec
from bulletproof_gadgets_tpu.ops import ristretto_device as rd


def test_canonical_and_bytes():
    rnd = random.Random(7)
    vals = [0, 1, P - 1, P, P + 5, 2 * P - 1, rnd.randrange(2 ** 260)]
    rows = jnp.asarray(fp.to_limbs_np([v % (2 ** 260) for v in vals]))
    got = np.asarray(jax.jit(rd.canonical)(rows))
    for i, v in enumerate(vals):
        want = (v % (2 ** 260)) % P
        have = sum(int(got[i, j]) << (13 * j) for j in range(fp.NL))
        assert have == want, (i, v)
    b = np.asarray(jax.jit(rd.canonical_bytes)(jnp.asarray(got)))
    for i, v in enumerate(vals):
        want = ((v % (2 ** 260)) % P).to_bytes(32, "little")
        assert bytes(b[i].astype(np.uint8)) == want, i


def test_compress_matches_host():
    rnd = random.Random(9)
    pts = []
    for _ in range(6):
        k = rnd.randrange(1, L)
        pts.append(RISTRETTO_BASEPOINT.scalar_mul(k))
    # stack as [4, NL, k] cols like the MSM pipeline output, with non-affine
    # Z (scale by a random z to exercise the generic path)
    cols = np.zeros((4, fp.NL, len(pts)), dtype=np.int32)
    for i, pt in enumerate(pts):
        z = rnd.randrange(1, P)
        X, Y, Z, T = (pt.X * z % P, pt.Y * z % P, pt.Z * z % P,
                      pt.T * z % P)
        cols[0, :, i] = fp.to_limbs_np([X])[0]
        cols[1, :, i] = fp.to_limbs_np([Y])[0]
        cols[2, :, i] = fp.to_limbs_np([Z])[0]
        cols[3, :, i] = fp.to_limbs_np([T])[0]
    got = np.asarray(jax.jit(rd.compress_cols)(jnp.asarray(cols)))
    for i, pt in enumerate(pts):
        assert bytes(got[i].astype(np.uint8)) == pt.compress(), i


def test_challenge_limbs_matches_wide_reduction():
    rnd = random.Random(11)
    for _ in range(4):
        raw = bytes(rnd.randrange(256) for _ in range(64))
        b = jnp.asarray(np.frombuffer(raw, dtype=np.uint8).astype(np.int32))
        limbs = np.asarray(jax.jit(rd.challenge_limbs)(b))
        got = flvec.limbs_to_ints(limbs[None, :])[0]
        assert got == int.from_bytes(raw, "little") % L


def test_inv_mont_matches_fermat():
    rnd = random.Random(13)
    from bulletproof_gadgets_tpu.ops.fl import R as _R
    for _ in range(3):
        u = rnd.randrange(1, L)
        u_std = jnp.asarray(flvec.to_limbs([u]))[0]
        inv_m = np.asarray(jax.jit(rd.inv_mont)(u_std))
        got = flvec.limbs_to_ints(inv_m[None, :])[0]
        assert got == pow(u, L - 2, L) * _R % L
