"""Device transcript (ops/keccak_device + ops/strobe_device) vs the host
merlin implementation — byte identity through realistic absorb/challenge
sequences, including snapshots of mid-protocol host transcripts."""
import numpy as np
import jax
import jax.numpy as jnp

from bulletproof_gadgets_tpu.utils.merlin import Transcript
from bulletproof_gadgets_tpu.ops.strobe_device import (DeviceStrobe,
                                                       snapshot_host)


def _device_replay(snap, msgs, chal_label, chal_n):
    """Jit a replay: absorb msgs (traced byte arrays) then challenge."""
    state, pos, pb, cf = snap

    def run(state, *datas):
        ds = DeviceStrobe(state, pos, pb, cf)
        for (label, _), data in zip(msgs, datas):
            ds.append_message(label, data)
        out = ds.challenge_bytes(chal_label, chal_n)
        return out, ds.state

    datas = [jnp.asarray(np.frombuffer(m, dtype=np.uint8).astype(np.int32))
             for _, m in msgs]
    out, st = jax.jit(run)(jnp.asarray(state), *datas)
    return bytes(np.asarray(out).astype(np.uint8)), st


def test_device_transcript_matches_host():
    t = Transcript(b"test-proto")
    t.append_message(b"init", b"some absorbed bytes")
    t.append_u64(b"m", 7)
    _ = t.challenge_bytes(b"warmup", 32)

    snap = snapshot_host(t)
    msgs = [(b"L", bytes(range(32))), (b"R", bytes(range(100, 132))),
            (b"big", bytes(200))]       # crosses the 166-byte rate boundary
    got, _ = _device_replay(snap, msgs, b"u", 64)

    for label, m in msgs:
        t.append_message(label, m)
    want = t.challenge_bytes(b"u", 64)
    assert got == want


def test_device_transcript_chained_rounds():
    # IPA-like loop: absorb two 32-byte points, squeeze 64, repeat 5x
    t = Transcript(b"ipa")
    t.append_u64(b"n", 16)
    snap = snapshot_host(t)
    state, pos, pb, cf = snap
    state = jnp.asarray(state)
    rng = np.random.RandomState(3)
    for rnd in range(5):
        Lb = rng.randint(0, 256, 32).astype(np.uint8).tobytes()
        Rb = rng.randint(0, 256, 32).astype(np.uint8).tobytes()

        def run(state, Ld, Rd, pos=pos, pb=pb, cf=cf):
            ds = DeviceStrobe(state, pos, pb, cf)
            ds.append_message(b"L", Ld)
            ds.append_message(b"R", Rd)
            out = ds.challenge_bytes(b"u", 64)
            return out, ds.state, ds.meta

        Ld = jnp.asarray(np.frombuffer(Lb, dtype=np.uint8).astype(np.int32))
        Rd = jnp.asarray(np.frombuffer(Rb, dtype=np.uint8).astype(np.int32))
        ds = DeviceStrobe(state, pos, pb, cf)
        ds.append_message(b"L", Ld)
        ds.append_message(b"R", Rd)
        out = ds.challenge_bytes(b"u", 64)
        state, (pos, pb, cf) = ds.state, ds.meta

        t.append_message(b"L", Lb)
        t.append_message(b"R", Rb)
        want = t.challenge_bytes(b"u", 64)
        assert bytes(np.asarray(out).astype(np.uint8)) == want, rnd
    # from round 2 on the static meta must be stable (jit cache hit)
    assert (pos, pb, cf) == (64, 60, 7) or pos == 64
