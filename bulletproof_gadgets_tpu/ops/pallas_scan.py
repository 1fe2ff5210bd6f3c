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
    local = jax.lax.broadcasted_iota(jnp.int32, (1, CH), 1)
    pos = (pid * CH + local) % seg
    acc = (x[:], y[:], z[:], t[:])
    idc = (idx[:], idy[:], idy[:], idx[:])
    s = 1
    while s < CH:
        shifted = tuple(_roll_lanes(a, s) for a in acc)
        # block-LOCAL segmented prefix: `local >= s` stops the circular roll
        # wrapping the block tail into the head (matters when seg > CH and
        # this is not the segment's first block — pass 2 adds those
        # carry-ins); `pos >= s` stops crossings of in-block segment starts
        # when seg < CH.
        mask = (pos >= s) & (local >= s)
        addend = tuple(jnp.where(mask, a, i) for a, i in zip(shifted, idc))
        acc = _padd_body(bias[:], d2[:], *acc, *addend)
        s *= 2
    ox[:], oy[:], oz[:], ot[:] = acc


def _offset_kernel(bias, d2, offx, offy, offz, offt,
                   x, y, z, t, ox, oy, oz, ot):
    # offsets arrive pre-broadcast to the full [NL, CH] block width (Mosaic
    # requires lane-dim block sizes of 128k or the whole array, so a
    # [NL, 1]-per-block index map does not lower; the XLA-level broadcast
    # materializes four full [NL, m] offset arrays — one extra full-size
    # write+read per coordinate on top of the 3 main passes)
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

    # pass 3: add block offsets.  Each block's [NL, 1] offset column is
    # broadcast to the full CH lane width before the call (lane-aligned
    # blocks are the only shapes the Mosaic lowering accepts).
    exclusive_b = tuple(
        jnp.broadcast_to(x[:, :, None], (NL, nb, CH)).reshape(NL, m)
        for x in exclusive)
    out = pl.pallas_call(
        _offset_kernel,
        grid=grid,
        in_specs=[cspec] * 2 + [spec] * 8,
        out_specs=[spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((NL, m), jnp.int32)] * 4,
        interpret=_use_interpret(),
    )(jnp.asarray(_SUB_BIAS_COL), jnp.asarray(_D2_COL),
      *exclusive_b, *prefix)
    return tuple(out)
