"""STROBE-128 / Merlin transcript operations on device state.

Mirrors utils/merlin.py (pinned to merlin 2.0.1) with the 200-byte duplex
state living in a jnp array while the byte POSITIONS stay host Python ints:
every transcript op in the proof protocol has a statically-known label and
length, so pos / pos_begin / cur_flags evolve deterministically at trace
time and each absorb/squeeze lowers to a couple of static slice updates (no
data-dependent control flow; the only traced data is the message bytes —
point encodings computed on device).

Used by ops/ipa_fused.py to keep the whole inner-product argument on
device: jitted round functions are cached per (pos, pos_begin, cur_flags)
entry tuple, which is constant from round 2 on (a PRF always ends at
pos=64 after a forced permutation).

Oracle: utils/merlin.py, tests/test_device_transcript.py.
"""
import numpy as np
import jax.numpy as jnp

from .keccak_device import f1600_state
from ..utils.merlin import (STROBE_R, _FLAG_I, _FLAG_A, _FLAG_C, _FLAG_M,
                            _FLAG_K)


def _const_bytes(data: bytes):
    return jnp.asarray(np.frombuffer(data, dtype=np.uint8).astype(np.int32))


class DeviceStrobe:
    """Traced STROBE-128 duplex.  `state` is a [200] int32 byte-value
    array (traced); pos/pos_begin/cur_flags are Python ints (static)."""

    __slots__ = ("state", "pos", "pos_begin", "cur_flags")

    def __init__(self, state, pos: int, pos_begin: int, cur_flags: int):
        self.state = state
        self.pos = pos
        self.pos_begin = pos_begin
        self.cur_flags = cur_flags

    @property
    def meta(self):
        return (self.pos, self.pos_begin, self.cur_flags)

    # -- duplex plumbing (mirrors utils/merlin.Strobe128) ------------------
    def _run_f(self):
        s = self.state
        s = s.at[self.pos].set(s[self.pos] ^ self.pos_begin)
        s = s.at[self.pos + 1].set(s[self.pos + 1] ^ 0x04)
        s = s.at[STROBE_R + 1].set(s[STROBE_R + 1] ^ 0x80)
        self.state = f1600_state(s)
        self.pos = 0
        self.pos_begin = 0

    def _absorb(self, data):
        """data: [k] int32 byte values (traced) or host bytes."""
        if isinstance(data, (bytes, bytearray)):
            data = _const_bytes(bytes(data))
        k = data.shape[0]
        off = 0
        while off < k:
            run = min(STROBE_R - self.pos, k - off)
            seg = self.state[self.pos:self.pos + run] ^ data[off:off + run]
            self.state = self.state.at[self.pos:self.pos + run].set(seg)
            self.pos += run
            off += run
            if self.pos == STROBE_R:
                self._run_f()

    def _squeeze(self, n: int):
        outs = []
        while n > 0:
            run = min(STROBE_R - self.pos, n)
            outs.append(self.state[self.pos:self.pos + run])
            self.state = self.state.at[self.pos:self.pos + run].set(0)
            self.pos += run
            n -= run
            if self.pos == STROBE_R:
                self._run_f()
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs)

    def _begin_op(self, flags: int, more: bool):
        if more:
            assert self.cur_flags == flags
            return
        old_begin = self.pos_begin
        self.pos_begin = self.pos + 1
        self.cur_flags = flags
        self._absorb(bytes([old_begin, flags]))
        if flags & (_FLAG_C | _FLAG_K) and self.pos != 0:
            self._run_f()

    def meta_ad(self, data, more: bool):
        self._begin_op(_FLAG_M | _FLAG_A, more)
        self._absorb(data)

    def ad(self, data, more: bool):
        self._begin_op(_FLAG_A, more)
        self._absorb(data)

    def prf(self, n: int, more: bool):
        self._begin_op(_FLAG_I | _FLAG_A | _FLAG_C, more)
        return self._squeeze(n)

    # -- merlin framing ----------------------------------------------------
    def append_message(self, label: bytes, message):
        k = (len(message) if isinstance(message, (bytes, bytearray))
             else message.shape[0])
        self.meta_ad(label, False)
        self.meta_ad(k.to_bytes(4, "little"), True)
        self.ad(message, False)

    def challenge_bytes(self, label: bytes, n: int):
        self.meta_ad(label, False)
        self.meta_ad(n.to_bytes(4, "little"), True)
        return self.prf(n, False)


def snapshot_host(transcript):
    """Host Transcript (utils.merlin.Transcript or native.NativeTranscript)
    -> (state [200] np.int32, pos, pos_begin, cur_flags)."""
    strobe = getattr(transcript, "strobe", None)
    if strobe is not None:                      # pure-Python Transcript
        state = np.frombuffer(bytes(strobe.state), dtype=np.uint8)
        return (state.astype(np.int32), strobe.pos, strobe.pos_begin,
                strobe.cur_flags)
    raw = transcript._buf.raw                   # NativeTranscript C layout:
    state = np.frombuffer(raw[:200], dtype=np.uint8)  # st[200], pos,
    return (state.astype(np.int32), raw[200], raw[201], raw[202])
