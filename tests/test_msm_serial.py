"""Serial-bucket Pippenger MSM (ops/msm_serial.py) vs the host oracle.

Covers: schedule construction (C and numpy paths agree), single MSM,
batched msm_many, zero scalars, identity results, and the GeneratorTable
wrapper — mirroring how prover.prove drives dalek's Pippenger
(/root/reference/src/prove.rs:79).
"""
import numpy as np
import pytest

from bulletproof_gadgets_tpu.core.ristretto import (
    RistrettoPoint, RISTRETTO_BASEPOINT, batch_normalize, P)
from bulletproof_gadgets_tpu.core.scalar import L
from bulletproof_gadgets_tpu.core import msm as core_msm
from bulletproof_gadgets_tpu.ops import msm_serial
from bulletproof_gadgets_tpu.ops.msm import signed_digits


def _points(n, seed=7):
    rng = np.random.default_rng(seed)
    pts = []
    for _ in range(n):
        k = int.from_bytes(rng.bytes(32), "little") % L
        pts.append(RISTRETTO_BASEPOINT.scalar_mul(k))
    return pts


def _scalars(n, seed=11):
    rng = np.random.default_rng(seed)
    return [int.from_bytes(rng.bytes(32), "little") % L for _ in range(n)]


def test_batch_normalize():
    pts = _points(5)
    summed = [p + q for p, q in zip(pts, pts[1:])]  # Z != 1
    aff = batch_normalize(summed + [RistrettoPoint.identity()])
    for orig, a in zip(summed + [RistrettoPoint.identity()], aff):
        assert a.Z == 1
        assert a.T == a.X * a.Y % P
        assert a == orig


def test_schedule_c_matches_numpy():
    rng = np.random.default_rng(3)
    n, wt = 257, 64
    digits = rng.integers(-128, 128, size=(n, wt)).astype(np.int32)
    lib_s = msm_serial.build_schedule(digits, n)
    np_s = msm_serial._schedule_numpy(digits, n)
    # both fill in ascending point order -> identical schedules
    assert lib_s.idx.shape == np_s.idx.shape
    assert np.array_equal(lib_s.idx, np_s.idx)
    assert np.array_equal(lib_s.segid, np_s.segid)
    assert np.array_equal(lib_s.last_pos, np_s.last_pos)
    assert lib_s.merge_steps == np_s.merge_steps


@pytest.mark.parametrize("n", [1, 3, 50, 130])
def test_msm_matches_oracle(n):
    pts = _points(n)
    ks = _scalars(n)
    want = core_msm.msm_host(ks, pts)
    got = msm_serial.msm(ks, pts)
    assert got == want


def test_msm_zero_and_identity():
    pts = _points(4)
    assert msm_serial.msm([0, 0, 0, 0], pts) == RistrettoPoint.identity()
    ks = [1, 0, L - 1, 0]
    want = core_msm.msm_host(ks, pts)
    assert msm_serial.msm(ks, pts) == want


def test_msm_many_batched():
    n = 40
    pts = _points(n, seed=23)
    src, ns = msm_serial.prep_source(pts)
    vecs = [_scalars(n, seed=s) for s in (1, 2, 3)]
    got = msm_serial.msm_many(vecs, src, ns)
    for v, g in zip(vecs, got):
        assert g == core_msm.msm_host(v, pts)


def test_msm_bit_scalars_split_buckets():
    """Bit-valued scalars put every digit in bucket (0, 1) — the worst
    load-imbalance case; exercises sub-lane splitting + segmented merge."""
    n = 96
    pts = _points(n, seed=31)
    rng = np.random.default_rng(13)
    ks = [int(b) for b in rng.integers(0, 2, n)]
    want = core_msm.msm_host(ks, pts)
    got = msm_serial.msm(ks, pts)
    assert got == want


def test_generator_table():
    from bulletproof_gadgets_tpu.core.gens import (PedersenGens,
                                                   BulletproofGens)
    pc = PedersenGens.default()
    bp = BulletproofGens(32)
    G, H = list(bp.G(32)), list(bp.H(32))
    t = msm_serial.GeneratorTable(G, H, pc.B, pc.B_blinding)
    vec = _scalars(t.m, seed=5)
    (got,) = t.msm_many([vec])
    want = core_msm.msm_host(vec, G + H + [pc.B, pc.B_blinding])
    assert got == want


def test_chunked_bucket_accumulation(monkeypatch):
    """Round-chunked accumulation (large-table memory path: accumulator-
    carrying kernels over sliced gathers) must match the host oracle; the
    slot budget is shrunk so a small case exercises several chunks."""
    from bulletproof_gadgets_tpu.ops import msm_serial as ms
    from bulletproof_gadgets_tpu.core.msm import msm_host
    from bulletproof_gadgets_tpu.core.gens import BulletproofGens
    from bulletproof_gadgets_tpu.core.scalar import L
    import random as _r

    rnd = _r.Random(9)
    n = 256
    gens = BulletproofGens(n // 2, 1)
    pts = gens.G(n // 2) + gens.H(n // 2)
    src, _ = ms.prep_source(pts)
    monkeypatch.setattr(ms, "_SLOT_BUDGET", 4096 * 8)
    ks = [rnd.randrange(L) for _ in range(n)]
    assert ms.msm_many([ks], src, n)[0] == msm_host(ks, pts)


def test_static_c13_matches_host():
    """c=13 static device path (limb-width windows, 20x4096 buckets) vs the
    host MSM oracle."""
    import numpy as np
    import jax.numpy as jnp
    from bulletproof_gadgets_tpu.ops import flvec
    from bulletproof_gadgets_tpu.ops import msm_serial as ms
    from bulletproof_gadgets_tpu.core.msm import msm_host
    from bulletproof_gadgets_tpu.core.ristretto import RISTRETTO_BASEPOINT
    from bulletproof_gadgets_tpu.core.scalar import L
    import random

    rnd = random.Random(21)
    n = 64
    pts = [RISTRETTO_BASEPOINT.scalar_mul(rnd.randrange(1, L))
           for _ in range(n)]
    src, _ = ms.prep_source(pts)
    ks = [rnd.randrange(L) for _ in range(n)]
    dig = flvec.digits13_device(jnp.asarray(flvec.to_limbs(ks)))  # [20, n]
    got = ms._launch_static(dig, src, n, c=13)[0]
    want = msm_host(ks, pts)
    assert got == want


def test_digits13_recode_value():
    import numpy as np
    import jax.numpy as jnp
    from bulletproof_gadgets_tpu.ops import flvec
    from bulletproof_gadgets_tpu.core.scalar import L
    import random
    rnd = random.Random(23)
    ks = [0, 1, L - 1, rnd.randrange(L), rnd.randrange(L)]
    dig = np.asarray(flvec.digits13_device(
        jnp.asarray(flvec.to_limbs(ks)))).astype(np.int64)
    for i, k in enumerate(ks):
        v = sum(int(dig[w, i]) << (13 * w) for w in range(20))
        assert v == k, (i, k)
        assert np.abs(dig[:, i]).max() <= 4096


def test_point_chunked_launch_matches_host(monkeypatch):
    """Tables above _POINT_CHUNK split into per-chunk pipelines whose
    window sums combine with the group law; shrink the threshold to
    exercise the path on a small table (incl. a ragged last chunk)."""
    import numpy as np
    import jax.numpy as jnp
    from bulletproof_gadgets_tpu.ops import flvec
    from bulletproof_gadgets_tpu.ops import msm_serial as ms
    from bulletproof_gadgets_tpu.core.msm import msm_host
    from bulletproof_gadgets_tpu.core.ristretto import RISTRETTO_BASEPOINT
    from bulletproof_gadgets_tpu.core.scalar import L
    import random

    monkeypatch.setattr(ms, "_POINT_CHUNK", 24)   # 96 points -> 4 chunks
    rnd = random.Random(31)
    n = 90                                        # ragged: 24+24+24+18
    pts = [RISTRETTO_BASEPOINT.scalar_mul(rnd.randrange(1, L))
           for _ in range(n)]
    src, _ = ms.prep_source(pts)
    ks = [[rnd.randrange(L) for _ in range(n)] for _ in range(2)]
    dig = flvec.digits_t_stacked(ks)
    got = ms.msm_many_digits_t(dig, src, n)
    for i in range(2):
        assert got[i] == msm_host(ks[i], pts), i
