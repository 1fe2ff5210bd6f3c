"""Batched MiMCHash-256b sponge on TPU.

Same semantics as the host models/mimc.py (486 rounds of x^3 + round
constant, zero keys, sponge over 32-byte blocks) but vectorized over a batch
of preimages in Montgomery-domain F_l limbs — the "fused round kernel" from
BASELINE.md's benchmark configs.  The 486-round loop is a lax.fori_loop, so
the traced graph holds ONE cube body; the batch axis feeds the VPU.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import fl
from ..core.scalar import L, Scalar
from ..models.mimc_constants import ROUND_CONSTANTS
from ..models import mimc as mimc_host
from ..utils.conversions import be_to_scalars

NUM_ROUNDS = 486

_CONSTS_MONT = None


def _consts_mont() -> np.ndarray:
    global _CONSTS_MONT
    if _CONSTS_MONT is None:
        _CONSTS_MONT = fl.to_mont_np([c % L for c in ROUND_CONSTANTS])
    return _CONSTS_MONT


@jax.jit
def mimc_sponge_device(blocks_mont):
    """blocks_mont: [batch, n_blocks, NW] Montgomery-domain limb arrays.
    Returns [batch, NW] (Montgomery domain)."""
    batch, n_blocks, _ = blocks_mont.shape
    consts = jnp.asarray(_consts_mont())

    def round_body(i, state):
        x = fl.add(state, consts[i])
        sq = fl.mont_mul(x, x)
        return fl.mont_mul(sq, x)

    def block_body(j, state):
        block = jax.lax.dynamic_index_in_dim(blocks_mont, j, axis=1,
                                             keepdims=False)
        state = fl.add(state, block)
        return jax.lax.fori_loop(0, NUM_ROUNDS, round_body, state)

    state = fl.zeros((batch,))
    return jax.lax.fori_loop(0, n_blocks, block_body, state)


def mimc_hash_batch(preimages) -> list:
    """Hash a batch of byte-string preimages (device path, bit-exact vs the
    host mimc_hash).  Preimages are grouped by padded block count so each
    group is one rectangular kernel call."""
    results = [None] * len(preimages)
    groups = {}
    for idx, data in enumerate(preimages):
        scalars = mimc_host.pad_preimage(be_to_scalars(data))
        groups.setdefault(len(scalars), []).append((idx, scalars))
    for n_blocks, entries in groups.items():
        flat = []
        for _idx, scalars in entries:
            flat.extend(s.v for s in scalars)
        blocks = fl.to_mont_np(flat).reshape(len(entries), n_blocks, fl.NW)
        out = mimc_sponge_device(jnp.asarray(blocks))
        values = fl.from_mont(out)
        for (idx, _), v in zip(entries, values):
            results[idx] = Scalar(v)
    return results
