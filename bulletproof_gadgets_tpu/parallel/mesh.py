"""Device mesh helpers.

The framework's parallel axes (SURVEY.md §2.C):
  shard — MSM point-partitioning / IPA vector sharding (the "tensor/sequence
          parallel" axis of this workload: generator vectors and point sets
          are split across chips, partial window sums are combined over ICI)
  batch — data parallelism over independent witnesses/statements (batched
          MiMC hashing, batched commitments)

The reference is single-process/single-threaded (no analogue); this design
is new, constrained only by proof semantics.
"""
import jax
from jax.sharding import Mesh
import numpy as np

_active = None


def make_mesh(n_shard: int = None, n_batch: int = 1) -> Mesh:
    devices = np.array(jax.devices())
    if n_shard is None:
        n_shard = len(devices) // n_batch
    devices = devices[: n_shard * n_batch].reshape(n_shard, n_batch)
    return Mesh(devices, ("shard", "batch"))


def activate(mesh: Mesh) -> None:
    """Make `mesh` the framework-wide execution mesh: generator tables (and
    with them every prover/verifier MSM) shard over its "shard" axis.  Pass
    None to return to single-device execution."""
    global _active
    _active = mesh


def active_mesh():
    return _active
