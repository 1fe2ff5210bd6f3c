"""Blocked segmented prefix scan of Edwards points (Pallas).

The flat MSM pipeline needs inclusive prefix sums (group law) within
segments (windows / bucket ranges) of a [NL, m] lane array.  A plain
Hillis-Steele at the XLA level costs log2(m) full-array HBM round trips;
this version does it in ~3 passes:

  pass 1 (kernel): per 512-lane block, an in-VMEM masked Hillis scan
          (9 fused steps, zero HBM traffic between steps);
  pass 2: segment-aware scan of the tiny block-totals array (jnp path);
  pass 3 (kernel): add each block's exclusive offset point to its lanes.

When the segment length divides the block size, passes 2/3 vanish.
Work: ~10m padd-lanes vs 17m, traffic: ~3 passes vs 17.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import fp
from .pallas_curve import (_padd_body, _SUB_BIAS_COL, _D2_COL,
                           _use_interpret)

NL = fp.NL
CH = 512                      # lanes per block
_LOG_CH = 9

_ID_X = np.zeros((NL, 1), dtype=np.int32)
_ID_Y = np.zeros((NL, 1), dtype=np.int32)
_ID_Y[0, 0] = 1


def _roll_lanes(x, s):
    # static right-shift along lanes: out[:, j] = x[:, j - s]
    return jnp.concatenate([x[:, -s:], x[:, :-s]], axis=1)


def _scan_block_kernel(seg: int, bias, d2, idx, idy,
                       x, y, z, t, ox, oy, oz, ot):
    pid = pl.program_id(0)
    gl = (pid * CH + jax.lax.broadcasted_iota(jnp.int32, (1, CH), 1))
    pos = gl % seg
    acc = (x[:], y[:], z[:], t[:])
    idc = (idx[:], idy[:], idy[:], idx[:])
    s = 1
    while s < CH:
        shifted = tuple(_roll_lanes(a, s) for a in acc)
        mask = pos >= s
        addend = tuple(jnp.where(mask, a, i) for a, i in zip(shifted, idc))
        acc = _padd_body(bias[:], d2[:], *acc, *addend)
        s *= 2
    ox[:], oy[:], oz[:], ot[:] = acc


def _offset_kernel(bias, d2, offx, offy, offz, offt,
                   x, y, z, t, ox, oy, oz, ot):
    # each grid step receives ITS block's [NL, 1] offset column via the
    # BlockSpec index map — broadcast happens in-register inside _padd_body,
    # so no [NL, m] pre-broadcast array ever touches HBM
    acc = _padd_body(bias[:], d2[:], x[:], y[:], z[:], t[:],
                     offx[:], offy[:], offz[:], offt[:])
    ox[:], oy[:], oz[:], ot[:] = acc


@partial(jax.jit, static_argnums=(1,))
def scan_segmented(pts, seg: int):
    """Inclusive prefix scan within segments of `seg` lanes.
    pts: pytree of [NL, m] int32; m % CH == 0 and (seg % CH == 0 or
    CH % seg == 0)."""
    m = pts[0].shape[1]
    nb = m // CH
    grid = (nb,)
    spec = pl.BlockSpec((NL, CH), lambda i: (0, i), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((NL, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    consts = (jnp.asarray(_SUB_BIAS_COL), jnp.asarray(_D2_COL),
              jnp.asarray(_ID_X), jnp.asarray(_ID_Y))

    prefix = pl.pallas_call(
        partial(_scan_block_kernel, seg),
        grid=grid,
        in_specs=[cspec] * 4 + [spec] * 4,
        out_specs=[spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((NL, m), jnp.int32)] * 4,
        interpret=_use_interpret(),
    )(*consts, *pts)
    prefix = tuple(prefix)

    if seg <= CH:
        # segments never straddle blocks: done
        return prefix

    # pass 2: block totals -> segment-aware exclusive block offsets
    last = tuple(x[:, CH - 1::CH] for x in prefix)       # [NL, nb]
    seg_b = seg // CH
    from .msm_cols import _masked_scan, _select
    inclusive = _masked_scan(last, seg_b, max(1, (seg_b - 1).bit_length()))
    rolled = tuple(jnp.roll(x, 1, axis=1) for x in inclusive)
    blane = jnp.arange(nb, dtype=jnp.int32) % seg_b
    idc = (_ID_X, _ID_Y, _ID_Y, _ID_X)
    exclusive = tuple(jnp.where((blane > 0)[None, :], r, jnp.asarray(i))
                      for r, i in zip(rolled, idc))

    # pass 3: add block offsets — block i reads its own [NL, 1] offset
    # column straight from the [NL, nb] array via the index map
    off_spec = pl.BlockSpec((NL, 1), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _offset_kernel,
        grid=grid,
        in_specs=[cspec] * 2
        + [off_spec] * 4 + [spec] * 4,
        out_specs=[spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((NL, m), jnp.int32)] * 4,
        interpret=_use_interpret(),
    )(jnp.asarray(_SUB_BIAS_COL), jnp.asarray(_D2_COL),
      *exclusive, *prefix)
    return tuple(out)
