"""Fused device-transcript IPA (ops/ipa_fused) vs the host path:
byte-identical L/R points, challenges, final a/b, and host-transcript
consistency after the replay."""
import numpy as np
import pytest

from bulletproof_gadgets_tpu.core.gens import PedersenGens, BulletproofGens
from bulletproof_gadgets_tpu.core.scalar import Scalar, L, exp_iter
from bulletproof_gadgets_tpu.core.ipa import InnerProductProof
from bulletproof_gadgets_tpu.core.transcript import innerproduct_domain_sep
from bulletproof_gadgets_tpu.utils.merlin import new_transcript, Transcript
from bulletproof_gadgets_tpu.ops import msm_serial, ipa_fused


def _rand_scalars(n, seed):
    rng = np.random.default_rng(seed)
    return [Scalar(int.from_bytes(rng.bytes(32), "little") % L)
            for _ in range(n)]


@pytest.mark.parametrize("n", [2, 8, 32])
@pytest.mark.parametrize("native", [False, True])
def test_fused_ipa_matches_host(n, native):
    pc = PedersenGens.default()
    bp = BulletproofGens(n)
    G, H = list(bp.G(n)), list(bp.H(n))
    a = _rand_scalars(n, 1)
    b = _rand_scalars(n, 2)
    y_inv = _rand_scalars(1, 3)[0]
    G_factors = [Scalar(1)] * n
    H_factors = exp_iter(y_inv, n)
    w = _rand_scalars(1, 4)[0]
    Q = pc.B.scalar_mul(w.v)

    t_host = Transcript(b"ipa-fused-test")
    host = InnerProductProof.create(
        t_host, Q, list(G_factors), list(H_factors),
        list(G), list(H), list(a), list(b))

    table = msm_serial.GeneratorTable(G, H, pc.B, pc.B_blinding)
    t_dev = (new_transcript if native else Transcript)(b"ipa-fused-test")
    innerproduct_domain_sep(t_dev, n)
    L_vec, R_vec, a0, b0 = ipa_fused.create(
        t_dev, table, w.v % L,
        [s.v % L for s in G_factors], [s.v % L for s in H_factors],
        [s.v for s in a], [s.v for s in b])

    assert L_vec == host.L_vec
    assert R_vec == host.R_vec
    assert a0 == host.a.v % L
    assert b0 == host.b.v % L
    # host transcript replay left t_dev in the identical state
    assert t_host.challenge_bytes(b"x", 32) == \
        t_dev.challenge_bytes(b"x", 32)


@pytest.mark.parametrize("n,fold_at", [(64, 2), (256, 3)])
def test_fused_ipa_folded_table_matches_host(n, fold_at, monkeypatch):
    """Folded-table re-materialization (ops/ipa_fold): collapse the
    coefficient vectors into real device points every fold_at rounds and
    continue on the 2^fold_at-smaller table — L/R bytes, challenges and
    final a/b must stay identical to the host path."""
    monkeypatch.setenv("BPG_TPU_IPA_FOLD", "1")
    monkeypatch.setenv("BPG_TPU_IPA_FOLD_AT", str(fold_at))
    monkeypatch.setenv("BPG_TPU_IPA_FOLD_MIN", "4")

    pc = PedersenGens.default()
    bp = BulletproofGens(n)
    G, H = list(bp.G(n)), list(bp.H(n))
    a = _rand_scalars(n, 91)
    b = _rand_scalars(n, 92)
    y_inv = _rand_scalars(1, 93)[0]
    G_factors = [Scalar(1)] * n
    H_factors = exp_iter(y_inv, n)
    w = _rand_scalars(1, 94)[0]
    Q = pc.B.scalar_mul(w.v)

    t_host = Transcript(b"ipa-folded")
    host = InnerProductProof.create(
        t_host, Q, list(G_factors), list(H_factors),
        list(G), list(H), list(a), list(b))

    table = msm_serial.GeneratorTable(G, H, pc.B, pc.B_blinding)
    t_dev = Transcript(b"ipa-folded")
    innerproduct_domain_sep(t_dev, n)
    L_vec, R_vec, a0, b0 = ipa_fused.create(
        t_dev, table, w.v % L,
        [s.v % L for s in G_factors], [s.v % L for s in H_factors],
        [s.v for s in a], [s.v for s in b])
    assert L_vec == host.L_vec
    assert R_vec == host.R_vec
    assert a0 == host.a.v % L and b0 == host.b.v % L
    assert t_host.challenge_bytes(b"x", 32) == \
        t_dev.challenge_bytes(b"x", 32)


def test_fused_ipa_chunked_table(monkeypatch):
    """Huge-table path: per-round MSMs split into point chunks whose
    window sums combine with the group law (shrunk threshold)."""
    from bulletproof_gadgets_tpu.ops import msm_serial
    monkeypatch.setattr(msm_serial, "_POINT_CHUNK", 24)

    n = 16
    pc = PedersenGens.default()
    bp = BulletproofGens(n)
    G, H = list(bp.G(n)), list(bp.H(n))
    a = _rand_scalars(n, 5)
    b = _rand_scalars(n, 6)
    y_inv = _rand_scalars(1, 7)[0]
    G_factors = [Scalar(1)] * n
    H_factors = exp_iter(y_inv, n)
    w = _rand_scalars(1, 8)[0]
    Q = pc.B.scalar_mul(w.v)

    t_host = Transcript(b"ipa-chunked")
    host = InnerProductProof.create(
        t_host, Q, list(G_factors), list(H_factors),
        list(G), list(H), list(a), list(b))

    table = msm_serial.GeneratorTable(G, H, pc.B, pc.B_blinding)
    assert table.m > 24          # chunked path engaged
    t_dev = Transcript(b"ipa-chunked")
    innerproduct_domain_sep(t_dev, n)
    L_vec, R_vec, a0, b0 = ipa_fused.create(
        t_dev, table, w.v % L,
        [s.v % L for s in G_factors], [s.v % L for s in H_factors],
        [s.v for s in a], [s.v for s in b])
    assert L_vec == host.L_vec and R_vec == host.R_vec
    assert a0 == host.a.v % L and b0 == host.b.v % L


def test_fused_ipa_batched_matches_host():
    """Cross-proof batched rounds: 3 proofs' L/R stacked into one MSM per
    round, transcript steps vmapped — each proof byte-identical to the
    host path."""
    n = 16
    B = 3
    pc = PedersenGens.default()
    bp = BulletproofGens(n)
    G, H = list(bp.G(n)), list(bp.H(n))
    table = msm_serial.GeneratorTable(G, H, pc.B, pc.B_blinding)

    hosts, t_devs, args = [], [], []
    for i in range(B):
        a = _rand_scalars(n, 10 + i)
        b = _rand_scalars(n, 20 + i)
        y_inv = _rand_scalars(1, 30 + i)[0]
        G_factors = [Scalar(1)] * n
        H_factors = exp_iter(y_inv, n)
        w = _rand_scalars(1, 40 + i)[0]
        Q = pc.B.scalar_mul(w.v)
        th = Transcript(b"ipa-batch")
        th.append_u64(b"i", i)
        hosts.append(InnerProductProof.create(
            th, Q, list(G_factors), list(H_factors),
            list(G), list(H), list(a), list(b)))
        td = Transcript(b"ipa-batch")
        td.append_u64(b"i", i)
        innerproduct_domain_sep(td, n)
        t_devs.append(td)
        args.append((w.v % L, [s.v % L for s in G_factors],
                     [s.v % L for s in H_factors],
                     [s.v for s in a], [s.v for s in b]))

    results = ipa_fused.create_batched(
        t_devs, table,
        [a[0] for a in args], [a[1] for a in args], [a[2] for a in args],
        [a[3] for a in args], [a[4] for a in args])
    for i, (host, (L_vec, R_vec, a0, b0)) in enumerate(zip(hosts, results)):
        assert L_vec == host.L_vec, i
        assert R_vec == host.R_vec, i
        assert a0 == host.a.v % L and b0 == host.b.v % L, i


def test_fused_ipa_batched_mixed_transcript_meta():
    """Advisor r4 (low): a group whose transcripts differ in byte
    position at IPA start (e.g. different commitment counts upstream)
    must partition into meta-uniform subgroups, not assert."""
    n = 8
    B = 3
    pc = PedersenGens.default()
    bp = BulletproofGens(n)
    G, H = list(bp.G(n)), list(bp.H(n))
    table = msm_serial.GeneratorTable(G, H, pc.B, pc.B_blinding)

    hosts, t_devs, args = [], [], []
    for i in range(B):
        a = _rand_scalars(n, 50 + i)
        b = _rand_scalars(n, 60 + i)
        y_inv = _rand_scalars(1, 70 + i)[0]
        G_factors = [Scalar(1)] * n
        H_factors = exp_iter(y_inv, n)
        w = _rand_scalars(1, 80 + i)[0]
        Q = pc.B.scalar_mul(w.v)
        # proof 1 appends a DIFFERENT-length message -> different strobe
        # pos at IPA start -> mixed snapshot metas in one group
        pre = b"x" * (9 if i == 1 else 5)
        th = Transcript(b"ipa-mix")
        th.append_message(b"pre", pre)
        hosts.append(InnerProductProof.create(
            th, Q, list(G_factors), list(H_factors),
            list(G), list(H), list(a), list(b)))
        td = Transcript(b"ipa-mix")
        td.append_message(b"pre", pre)
        innerproduct_domain_sep(td, n)
        t_devs.append(td)
        args.append((w.v % L, [s.v % L for s in G_factors],
                     [s.v % L for s in H_factors],
                     [s.v for s in a], [s.v for s in b]))

    from bulletproof_gadgets_tpu.ops import strobe_device
    metas = {strobe_device.snapshot_host(t)[1:] for t in t_devs}
    assert len(metas) == 2                       # the scenario is real

    results = ipa_fused.create_batched(
        t_devs, table,
        [a[0] for a in args], [a[1] for a in args], [a[2] for a in args],
        [a[3] for a in args], [a[4] for a in args])
    for i, (host, (L_vec, R_vec, a0, b0)) in enumerate(zip(hosts, results)):
        assert L_vec == host.L_vec, i
        assert R_vec == host.R_vec, i
        assert a0 == host.a.v % L and b0 == host.b.v % L, i
