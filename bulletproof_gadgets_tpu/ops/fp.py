"""Batched F_p arithmetic (p = 2^255 - 19) for TPU, in JAX.

Representation: little-endian limb vectors on the last axis, NL = 20 limbs of
B = 13 bits each, dtype int32 (260-bit capacity).  This replaces the
reference stack's AVX2 SIMD backend (curve25519-dalek `avx2_backend`,
/root/reference/Cargo.toml:9,22) with the TPU VPU:

  * 13-bit limbs keep every schoolbook partial product (<= 2^26) and every
    20-term column sum (< 2^31) inside native int32 lanes — no 64-bit
    emulation.
  * Carries are *vectorized redistribution passes* (mask/shift/add across the
    limb axis), not sequential ripple chains: each pass is ~5 fused VPU ops
    and shrinks limb magnitude by 13 bits, so 2-3 passes normalize.  This
    keeps both the op count and the traced-graph size small — important
    because the MSM's associative scans inline the point-addition body
    O(log n) times.

Values are *lazily reduced*: limbs in [0, 2^13 + 2), value < 2^261, any
representative mod p.  Canonicalization happens host-side on export.
Oracle tests vs arbitrary-precision ints: tests/test_ops_fp.py.
"""

import numpy as np
import jax.numpy as jnp

B = 13
NL = 20                    # 260 bits
MASK = (1 << B) - 1
P = (1 << 255) - 19
FOLD = 608                 # 2^260 mod p = 2^5 * 19


def _int_to_limbs(v: int, width: int = NL) -> np.ndarray:
    return np.array([(v >> (B * i)) & MASK for i in range(width)],
                    dtype=np.int32)


def _make_sub_bias() -> np.ndarray:
    """Limb constants c_i for subtraction: sum c_i 2^(13 i) = 96 p with every
    c_i >= 2^13 + 2, so a + c - b is non-negative per limb (a, b nearly
    normalized)."""
    canon = [(96 * P >> (B * i)) & MASK for i in range(NL)]
    c = [0] * NL
    c[0] = canon[0] + (1 << B)
    for i in range(1, NL - 1):
        c[i] = canon[i] + (1 << B) - 1
    c[NL - 1] = ((96 * P) >> (B * (NL - 1))) - 1
    assert all(ci >= (1 << B) + 2 for ci in c), c
    assert sum(ci << (B * i) for i, ci in enumerate(c)) == 96 * P
    return np.array(c, dtype=np.int32)


_SUB_BIAS = _make_sub_bias()


# -- host <-> limb conversion ----------------------------------------------

def to_limbs_np(values) -> np.ndarray:
    out = np.empty((len(values), NL), dtype=np.int32)
    for i, v in enumerate(values):
        for j in range(NL):
            out[i, j] = (v >> (B * j)) & MASK
    return out


def ints_to_limbs_cols(values) -> np.ndarray:
    """Vectorized int list -> [NL, m] int32 limb columns (values < 2^256).
    ~100x faster than the per-limb Python loop for large point tables."""
    m = len(values)
    raw = b"".join(v.to_bytes(33, "little") for v in values)
    u8 = np.frombuffer(raw, dtype=np.uint8).reshape(m, 33).astype(np.int32)
    out = np.empty((NL, m), dtype=np.int32)
    for j in range(NL):
        bit = B * j
        off, shift = bit >> 3, bit & 7
        word = u8[:, off] | (u8[:, off + 1] << 8) | (u8[:, off + 2] << 16)
        out[j] = (word >> shift) & MASK
    return out


def from_limbs(arr) -> list:
    a = np.asarray(arr)
    flat = a.reshape(-1, NL)
    out = []
    for row in flat:
        v = 0
        for j in range(NL - 1, -1, -1):
            # addition, not OR: lazily-reduced limbs may exceed 2^B
            # (invariant bound 8799 — see pallas_curve._finalize)
            v = (v << B) + int(row[j])
        out.append(v % P)
    return out


# -- normalization ---------------------------------------------------------

def _redistribute(cols, rounds: int):
    """Vectorized carry passes: limb_k = (limb_k & M) + (limb_{k-1} >> B).
    Width grows by one column per pass so no top carry is ever dropped."""
    pad_width = [(0, 0)] * (cols.ndim - 1) + [(0, rounds)]
    cols = jnp.pad(cols, pad_width)
    for _ in range(rounds):
        lo = cols & MASK
        hi = cols >> B  # arithmetic shift (signed-safe)
        hi_up = jnp.roll(hi, 1, axis=-1).at[..., 0].set(0)
        cols = lo + hi_up
    return cols


def _fold(cols):
    """Fold columns >= NL down via 2^260 == FOLD (mod p)."""
    w = cols.shape[-1]
    if w <= NL:
        return cols
    lo = cols[..., :NL]
    hi = cols[..., NL:]
    if hi.shape[-1] < NL:
        pad_width = [(0, 0)] * (cols.ndim - 1) + [(0, NL - hi.shape[-1])]
        hi = jnp.pad(hi, pad_width)
    else:
        # fold hi recursively first (never needed for widths <= 40)
        hi = _fold(hi)
    return lo + hi * FOLD


def _finalize(cols):
    """Columns (any width <= 2*NL+1, |col| < 2^30-ish, non-negative total)
    -> nearly-normalized NL limbs (limbs <= ~8800).

    Every pass chain ends in a _fold, never a bare slice: carries ripple one
    limb per redistribute pass, so a representative close to 2^260 can leave
    a "stuck" carry in a high limb; the final pass pushes it into column 20
    and a slice would silently drop 2^260 = 608 (mod p).  (Found the hard
    way: five chained identity additions walked off the curve.)"""
    cols = _redistribute(cols, 3)
    cols = _fold(cols)
    cols = _redistribute(cols, 2)
    cols = _fold(cols)
    cols = _redistribute(cols, 2)
    cols = _fold(cols)
    cols = _redistribute(cols, 1)
    cols = _fold(cols)
    return cols


# -- public ops ------------------------------------------------------------

def add(a, b):
    return _finalize(a + b)


def sub(a, b):
    # a - b + 96p: per-limb non-negative by construction of the bias
    return _finalize(a + _SUB_BIAS - b)


# -- lazy (graph-compact) ops ----------------------------------------------
# Outputs are *loosely* normalized: limbs < ~10100, which still satisfies the
# schoolbook overflow bound 20 * m^2 < 2^31 (m <= 10362).  Lazy results may
# feed fp.mul or another single lazy op, nothing deeper.  These keep the
# traced graph of a point addition small (the MSM scans inline that body
# O(log n) times).

def _lazy_norm(cols):
    cols = _redistribute(cols, 2)
    cols = _fold(cols)
    return cols[..., :NL]


def add_lazy(a, b):
    return _lazy_norm(a + b)


def sub_lazy(a, b):
    return _lazy_norm(a + _SUB_BIAS - b)


def mul(a, b):
    """Column accumulation via NL shifted vector MACs, expressed as
    pad-and-tree-add (no dynamic-update-slice: XLA compiles those slowly
    under the MSM's vmap+scan nesting)."""
    nd = max(a.ndim, b.ndim)
    terms = []
    for i in range(NL):
        t = a[..., i:i + 1] * b                        # [..., NL]
        pad = [(0, 0)] * (nd - 1) + [(i, NL - 1 - i)]  # shift to column i
        terms.append(jnp.pad(t, pad))
    while len(terms) > 1:
        nxt = [terms[j] + terms[j + 1] for j in range(0, len(terms) - 1, 2)]
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    return _finalize(terms[0])


def mul_small(a, k: int):
    """Multiply by a small non-negative int constant (k < 2^17)."""
    return _finalize(a * k)


def zeros(shape=()):
    return jnp.zeros(tuple(shape) + (NL,), dtype=jnp.int32)


def ones(shape=()):
    z = np.zeros(tuple(shape) + (NL,), dtype=np.int32)
    z[..., 0] = 1
    return jnp.asarray(z)
