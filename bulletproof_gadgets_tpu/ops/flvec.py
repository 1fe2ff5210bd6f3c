"""Vectorized F_l (Ristretto255 scalar field) arithmetic for the prover's
hot loops, built on the Montgomery limb core in ops/fl.py.

This is the TPU replacement for the host Python bigint math that dominates
`prover.prove` (/root/reference/src/prove.rs:79) outside the MSMs:
  * the six t-polynomial inner products and l(x)/r(x) vector construction
    (dalek r1cs prover internals; core/r1cs.py),
  * the IPA per-round coefficient folds and c_L/c_R inner products
    (dalek inner_product_proof.rs; core/ipa.py),
  * the verifier's delta / g_scalars / h_scalars vectors.

Conventions:
  * arrays are [n, NW] int32 rows (NW = 21 13-bit limbs, capacity 2^273);
  * "std" = standard representative (any residue class, value < ~2^260);
    "mont" = Montgomery form x*R mod l.  mont_mul(std, mont) -> std and
    mont_mul(mont, mont) -> mont, so constants that multiply std vectors
    are uploaded in mont form;
  * subtraction adds a 128*l bias (value < 2^259.4) — legal mont_mul input
    since the closure only needs a*b < 2^510 and normalized limbs;
  * canonicalization happens host-side on export (limbs_to_ints % l).

Host<->device converters are numpy-vectorized (no per-element Python ints
on the hot path): scalars move as limb arrays, and MSM digit recoding
(digits_from_limbs) reads the limbs directly.
"""

import numpy as np
import jax.numpy as jnp

from .fl import NW, R, R2, mont_mul, _N_LIMBS  # noqa: F401
from .fp import B, MASK, _redistribute
from ..core.scalar import L

_BYTES = 35          # ceil(NW*B/8)+1: keeps every limb's 3-byte window in range


def _make_sub_bias() -> np.ndarray:
    """Limb constants B_i with sum(B_i 2^(13i)) == 0 (mod l), B_i >= 2^13+2^12
    for i <= 18, B_19 >= 2^10, B_20 = 0 — so a + bias - b is per-limb
    non-negative for any nearly-normalized a, b with value(b) < 2^255.

    Unlike F_p (ops/fp._make_sub_bias uses 96p, dense because p = 2^255-19),
    small multiples of l = 2^252 + delta have ZERO limbs 10..18 (delta ~
    2^124.5), so no k*l works directly.  Instead: a uniform per-limb floor u,
    plus the canonical limbs of (-value(u)) mod l to make the total a
    multiple of l.  Bias value < 2^262 — a legal mont_mul operand (the
    Montgomery closure needs only a*b/R + l < 2^255 and normalized limbs)."""
    u = [(1 << B) + (1 << (B - 1))] * 19 + [1 << 10, 0]
    v = sum(ui << (B * i) for i, ui in enumerate(u))
    c = (-v) % L
    bias = [ui + ((c >> (B * i)) & MASK) for i, ui in enumerate(u)]
    assert (sum(bi << (B * i) for i, bi in enumerate(bias)) % L) == 0
    assert all(bi >= (1 << B) + 2 for bi in bias[:19])
    assert bias[19] >= (1 << 10) and bias[20] == 0
    return np.array(bias, dtype=np.int32)


SUB_BIAS = _make_sub_bias()
_R2_LIMBS = np.array([(R2 >> (B * i)) & MASK for i in range(NW)],
                     dtype=np.int32)


# ---------------------------------------------------------------------------
# host <-> limb conversion (vectorized)

def to_limbs(values) -> np.ndarray:
    """list[int] (0 <= v < 2^260) -> [n, NW] int32 normalized limbs."""
    n = len(values)
    raw = b"".join(v.to_bytes(_BYTES, "little") for v in values)
    u8 = np.frombuffer(raw, dtype=np.uint8).reshape(n, _BYTES)
    u8 = u8.astype(np.int32)
    out = np.empty((n, NW), dtype=np.int32)
    for j in range(NW):
        bit = B * j
        off, shift = bit >> 3, bit & 7
        b2 = u8[:, off + 2] if off + 2 < _BYTES else 0
        word = u8[:, off] | (u8[:, off + 1] << 8) | (b2 << 16)
        out[:, j] = (word >> shift) & MASK
    return out


def to_mont(values) -> np.ndarray:
    return to_limbs([v * R % L for v in values])


def _normalize_np(arr) -> np.ndarray:
    """Exact carry propagation on host numpy (values < 2^273)."""
    a = np.ascontiguousarray(arr, dtype=np.int64).copy()
    for j in range(NW - 1):
        carry = a[..., j] >> B
        a[..., j] &= MASK
        a[..., j + 1] += carry
    assert (a[..., NW - 1] <= MASK).all(), "flvec value exceeded capacity"
    return a.astype(np.int32)


def limbs_to_ints(arr) -> list:
    """[n, NW] limbs (any near-normalized rep) -> canonical ints mod l."""
    a = _normalize_np(np.asarray(arr))
    out = []
    for row in a.reshape(-1, NW):
        v = 0
        for j in range(NW - 1, -1, -1):
            v = (v << B) + int(row[j])  # + not |: tolerate lazy limbs >= 2^B
        out.append(v % L)
    return out


def digits_from_limbs(arr) -> np.ndarray:
    """[n, NW] limbs (value < 2^253, any rep mod l — the group has order l
    so any representative gives the same MSM result) -> [n, 32] int32
    signed base-256 digits for ops/msm_serial."""
    a = _normalize_np(np.asarray(arr))
    n = a.shape[0] if a.ndim == 2 else int(np.prod(a.shape[:-1]))
    a = a.reshape(n, NW)
    digits = np.empty((n, 32), dtype=np.int32)
    for i in range(32):
        bit = 8 * i
        j, r = bit // B, bit % B
        hi = a[:, j + 1] if j + 1 < NW else 0
        word = a[:, j] | (hi << B)
        digits[:, i] = (word >> r) & 0xFF
    half = 128
    carry = np.zeros(n, dtype=np.int32)
    for w in range(32):
        d = digits[:, w] + carry
        carry = (d >= half).astype(np.int32)
        digits[:, w] = d - (carry << 8)
    assert not carry.any(), "value >= 2^253 in digits_from_limbs"
    return digits


def digits_t_stacked(vectors):
    """k equal-length int lists -> [k*32, n] int8 DEVICE digits (window-
    major per vector, vectors stacked) — the layout the serial-bucket MSM's
    device schedule builder consumes.  One limb upload, recode on device."""
    k = len(vectors)
    n = len(vectors[0])
    flat = [v % L for vec in vectors for v in vec]
    dig = digits_device(jnp.asarray(to_limbs(flat)))     # [32, k*n]
    return jnp.concatenate([dig[:, i * n:(i + 1) * n] for i in range(k)],
                           axis=0)


_digits_device_jit = None


def digits_device(x):
    """Device version of digits_from_limbs: [..., NW] limbs (value < 2^254,
    any rep mod l) -> [32, ...] int8 signed base-256 digits, WINDOW-LEADING
    (ready for the schedule builder's transposed layout).  Exact carry
    normalization via a sequential scan over the limb axis, then byte
    extraction and signed recode.  Jitted: the eager form dispatches ~365
    ops (~0.6 s per prove at 2^16)."""
    global _digits_device_jit
    if _digits_device_jit is None:
        import jax
        _digits_device_jit = jax.jit(_digits_device_impl)
    return _digits_device_jit(x)


_digits13_device_jit = None


def digits13_device(x):
    """Device c=13 digit recode: [..., NW] limbs (value < 2^253, any rep
    mod l) -> [20, ...] int16 signed base-8192 digits, window-leading.
    The 13-bit window width IS the limb width, so digits are just the
    exactly-normalized limbs with a signed recode — no byte extraction
    (the c=8 path's per-byte gather) at all."""
    global _digits13_device_jit
    if _digits13_device_jit is None:
        import jax
        _digits13_device_jit = jax.jit(_digits13_device_impl)
    return _digits13_device_jit(x)


def _digits13_device_impl(x):
    import jax

    xs = jnp.moveaxis(x, -1, 0)                     # [NW, ...]

    def carry_step(c, limb):
        v = limb + c
        return v >> B, v & MASK

    _, limbs = jax.lax.scan(carry_step, jnp.zeros_like(xs[0]), xs)

    half = 1 << (B - 1)

    def recode(c, d):
        v = d + c
        cc = (v >= half).astype(v.dtype)
        return cc, v - (cc << B)

    # value < 2^253 => limb 20 is zero and limb 19 < 2^6 absorbs the carry
    _, sdig = jax.lax.scan(recode, jnp.zeros_like(limbs[0]), limbs[:20])
    return sdig.astype(jnp.int16)


def _digits_device_impl(x):
    import jax

    xs = jnp.moveaxis(x, -1, 0)                     # [NW, ...]

    def carry_step(c, limb):
        v = limb + c
        return v >> B, v & MASK

    _, limbs = jax.lax.scan(carry_step, jnp.zeros_like(xs[0]), xs)

    byts = []
    for i in range(32):
        bit = 8 * i
        j, r = bit // B, bit % B
        word = limbs[j]
        if j + 1 < NW:
            word = word | (limbs[j + 1] << B)
        byts.append((word >> r) & 0xFF)
    byts = jnp.stack(byts)                          # [32, ...]

    def recode(c, d):
        v = d + c
        cc = (v >= 128).astype(v.dtype)
        return cc, v - (cc << 8)

    _, sdig = jax.lax.scan(recode, jnp.zeros_like(byts[0]), byts)
    return sdig.astype(jnp.int8)


# ---------------------------------------------------------------------------
# device ops (thin wrappers over ops/fl with subtraction)

def add(a, b):
    """Lazy add (value grows one bit; interleave with mont_mul)."""
    return _redistribute(a + b, 1)[..., :NW]


def sub(a, b):
    """a - b + 128*l: non-negative per limb; value < a + 2^259.4."""
    return _redistribute(a + jnp.asarray(SUB_BIAS) - b, 2)[..., :NW]


def neg(b):
    return sub(jnp.zeros((NW,), jnp.int32), b)


def sum_rows(x, axis=0):
    """Exact limb-wise sum along `axis` with chunking so column sums stay
    inside int32 (limbs < 2^13.2; chunk 2^16 rows -> < 2^30.2)."""
    n = x.shape[axis]
    chunk = 1 << 16
    if n > chunk:
        pad = (-n) % chunk
        if pad:
            padw = [(0, 0)] * x.ndim
            padw[axis] = (0, pad)
            x = jnp.pad(x, padw)
        shape = list(x.shape)
        shape[axis:axis + 1] = [(n + pad) // chunk, chunk]
        x = x.reshape(shape)
        inner = _redistribute(jnp.sum(x, axis=axis + 1), 2)[..., :NW]
        return sum_rows(inner, axis=axis)
    return _redistribute(jnp.sum(x, axis=axis), 2)[..., :NW]


def inner(a_std, b_std):
    """<a, b> mod l -> [NW] std (value < 2^253).  Inputs [n, NW]."""
    prods = mont_mul(a_std, b_std)          # a*b/R
    s = sum_rows(prods)                     # sum(a*b)/R, value < ~2^270
    return mont_mul(s, jnp.asarray(_R2_LIMBS))   # * R^2 / R = sum(a*b)


def powers_mont(base: int, count: int):
    """[count, NW] mont-form powers base^0..base^{count-1}, built ON DEVICE
    via a Montgomery associative scan (log2 count mont_mul sweeps) — the
    host int_powers + to_mont pipeline costs ~0.4 us/element in Python,
    which at padded_n = 2^17 is ~50 ms per prove."""
    one_m = jnp.asarray(to_mont([1]))
    if count <= 1:
        return one_m[:1]
    b_m = jnp.asarray(to_mont([base % L]))[0]
    return _powers_mont(b_m, one_m, count)


def _powers_mont_impl(b_m, one_m, count: int):
    import jax

    rep = jnp.broadcast_to(b_m[None, :], (count - 1, NW))
    scan = jax.lax.associative_scan(mont_mul, rep)
    return jnp.concatenate([one_m, scan], axis=0)


_powers_mont_jit = None


def _powers_mont(b_m, one_m, count: int):
    # module-level jit (created lazily so importing flvec doesn't import
    # jax.jit machinery): a per-call jit object would re-trace and
    # re-compile on EVERY prove (~4 s/compile on the remote backend)
    global _powers_mont_jit
    if _powers_mont_jit is None:
        import jax
        from functools import partial
        _powers_mont_jit = partial(jax.jit, static_argnums=(2,))(
            _powers_mont_impl)
    return _powers_mont_jit(b_m, one_m, count)
