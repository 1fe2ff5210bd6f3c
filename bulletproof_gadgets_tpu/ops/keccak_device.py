"""Keccak-f[1600] on device (uint32 lane pairs).

The Merlin transcript was host-only through round 3 — every Fiat-Shamir
challenge cost a device->host readback of the absorbed points plus a
host->device upload of the derived challenge, ~16 blocking tunnel round
trips per prove (docs/PERFORMANCE.md round-4 queue #1).  This module is the
permutation layer of the DEVICE transcript: 25 64-bit lanes carried as two
[25] uint32 arrays (lo, hi) — TPU has no native 64-bit integers — with all
rotations/permutation indices static, so the whole f1600 traces to a few
hundred fused vector ops on tiny arrays.

Behavioral reference: utils/keccak.py (host oracle, itself pinned to
hashlib SHA-3 in tests/test_keccak.py); the transcript protocol it backs is
merlin 2.0.1 as used by the reference (/root/reference/src/prove.rs:45).
Oracle test: tests/test_device_transcript.py.
"""
import numpy as np
import jax.numpy as jnp

from ..utils.keccak import _ROUND_CONSTANTS, _ROT

# lane index i = x + 5*y
_X = np.arange(25) % 5
_Y = np.arange(25) // 5
# theta: d index per lane is x
_D_IDX = _X.astype(np.int32)
# rho+pi: b[y + 5*((2x+3y)%5)] = rotl(a[x+5y], ROT[x][y]) — build the
# inverse gather: for output lane j, which input lane feeds it and by how
# much is it rotated.
_PI_SRC = np.zeros(25, dtype=np.int32)
_PI_ROT = np.zeros(25, dtype=np.int32)
for _x in range(5):
    for _y in range(5):
        _j = _y + 5 * ((2 * _x + 3 * _y) % 5)
        _PI_SRC[_j] = _x + 5 * _y
        _PI_ROT[_j] = _ROT[_x][_y]
# chi: a[x+y] = b[x+y] ^ (~b[(x+1)%5+y] & b[(x+2)%5+y])
_CHI_1 = ((_X + 1) % 5 + 5 * _Y).astype(np.int32)
_CHI_2 = ((_X + 2) % 5 + 5 * _Y).astype(np.int32)

_RC_LO = np.array([rc & 0xFFFFFFFF for rc in _ROUND_CONSTANTS],
                  dtype=np.uint32)
_RC_HI = np.array([rc >> 32 for rc in _ROUND_CONSTANTS], dtype=np.uint32)


def _rotl64(lo, hi, s: np.ndarray):
    """Per-lane rotate-left by static shift vector s (0 <= s < 64)."""
    s = np.asarray(s)
    swap = (s % 64) >= 32
    sm = (s % 32).astype(np.uint32)
    x_lo = jnp.where(swap, hi, lo)
    x_hi = jnp.where(swap, lo, hi)
    rs = ((32 - sm) % 32).astype(np.uint32)
    zero = sm == 0
    lo2 = jnp.where(zero, x_lo,
                    jnp.left_shift(x_lo, sm) | jnp.right_shift(x_hi, rs))
    hi2 = jnp.where(zero, x_hi,
                    jnp.left_shift(x_hi, sm) | jnp.right_shift(x_lo, rs))
    return lo2, hi2


def f1600(lo, hi):
    """One permutation over [25] uint32 lane halves (little-endian pairs)."""
    for r in range(24):
        # theta
        c_lo = lo[0:5] ^ lo[5:10] ^ lo[10:15] ^ lo[15:20] ^ lo[20:25]
        c_hi = hi[0:5] ^ hi[5:10] ^ hi[10:15] ^ hi[15:20] ^ hi[20:25]
        r_lo, r_hi = _rotl64(c_lo, c_hi, np.ones(5, dtype=np.int32))
        d_lo = jnp.roll(c_lo, 1) ^ jnp.roll(r_lo, -1)
        d_hi = jnp.roll(c_hi, 1) ^ jnp.roll(r_hi, -1)
        lo = lo ^ d_lo[_D_IDX]
        hi = hi ^ d_hi[_D_IDX]
        # rho + pi (inverse gather)
        b_lo, b_hi = _rotl64(lo[_PI_SRC], hi[_PI_SRC], _PI_ROT)
        # chi
        lo = b_lo ^ (~b_lo[_CHI_1] & b_lo[_CHI_2])
        hi = b_hi ^ (~b_hi[_CHI_1] & b_hi[_CHI_2])
        # iota
        lo = lo.at[0].set(lo[0] ^ _RC_LO[r])
        hi = hi.at[0].set(hi[0] ^ _RC_HI[r])
    return lo, hi


def state_to_lanes(state):
    """[200] int32 byte values -> ([25], [25]) uint32 lane halves."""
    b = state.astype(jnp.uint32).reshape(25, 8)
    lo = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)
    hi = b[:, 4] | (b[:, 5] << 8) | (b[:, 6] << 16) | (b[:, 7] << 24)
    return lo, hi


def lanes_to_state(lo, hi):
    """([25], [25]) uint32 -> [200] int32 byte values."""
    parts = [lo & 0xFF, (lo >> 8) & 0xFF, (lo >> 16) & 0xFF,
             (lo >> 24) & 0xFF,
             hi & 0xFF, (hi >> 8) & 0xFF, (hi >> 16) & 0xFF,
             (hi >> 24) & 0xFF]
    return jnp.stack(parts, axis=1).reshape(200).astype(jnp.int32)


def f1600_state(state):
    """[200] int32 byte-value state -> permuted, same layout."""
    lo, hi = state_to_lanes(state)
    lo, hi = f1600(lo, hi)
    return lanes_to_state(lo, hi)
