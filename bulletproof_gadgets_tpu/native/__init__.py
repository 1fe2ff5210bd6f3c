"""Native (C) runtime components, loaded via ctypes with Python fallback.

Currently: the Merlin transcript hot loop (Keccak-f1600/STROBE-128).  Build
with `make -C bulletproof_gadgets_tpu/native`; if the shared library is
missing the pure-Python implementation in utils/ is used transparently.
"""
import ctypes
import os
import subprocess

_LIB = None
_TRIED = False


def _build():
    here = os.path.dirname(__file__)
    try:
        subprocess.run(["make", "-C", here], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load():
    """Returns the ctypes library or None."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(__file__)
    path = os.path.join(here, "libbpg_native.so")
    if not os.path.exists(path):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(path)
        if not hasattr(lib, "bpg_msm_schedule_counts"):
            # stale build from before the MSM scheduler was added; unlink
            # first so dlopen (which dedupes by inode) maps the fresh build
            try:
                os.remove(path)
            except OSError:
                pass
            if not _build():
                return None
            lib = ctypes.CDLL(path)
        lib.bpg_transcript_size.restype = ctypes.c_int
        lib.bpg_transcript_init.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t]
        lib.bpg_transcript_append.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_char_p, ctypes.c_size_t]
        lib.bpg_transcript_challenge.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_char_p, ctypes.c_size_t]
        lib.bpg_msm_schedule_counts.restype = ctypes.c_int64
        lib.bpg_msm_schedule_counts.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p]
        lib.bpg_msm_schedule_fill.restype = None
        lib.bpg_msm_schedule_fill.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


class NativeTranscript:
    """Drop-in replacement for utils.merlin.Transcript backed by C."""

    __slots__ = ("_buf", "_lib")

    def __init__(self, label: bytes, lib=None):
        self._lib = lib or load()
        assert self._lib is not None
        self._buf = ctypes.create_string_buffer(
            self._lib.bpg_transcript_size())
        self._lib.bpg_transcript_init(self._buf, label, len(label))

    def append_message(self, label: bytes, message: bytes) -> None:
        self._lib.bpg_transcript_append(self._buf, label, len(label),
                                        message, len(message))

    def append_u64(self, label: bytes, value: int) -> None:
        self.append_message(label, value.to_bytes(8, "little"))

    def challenge_bytes(self, label: bytes, n: int) -> bytes:
        out = ctypes.create_string_buffer(n)
        self._lib.bpg_transcript_challenge(self._buf, label, len(label),
                                           out, n)
        return out.raw
