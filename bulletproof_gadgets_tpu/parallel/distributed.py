"""Multi-host initialization and host-aware meshes (jax.distributed).

The reference is single-process (SURVEY.md §2.C "Multi-host: none"); this
is the framework's scale-out layer.  Topology model:

  hosts  x  local chips
  (DCN)      (ICI)

The MSM/IPA "shard" axis is laid out so that consecutive shard indices land
on the SAME host first (minor = local chips): the all-gather of per-shard
window sums then rides ICI within a host, and only the O(windows) combined
points cross DCN.  Window sums are a few KB regardless of table size, so
scaling efficiency is bounded by the local kernel, not the interconnect —
the design target is >= 80% MSM scaling at 2 hosts (BASELINE.md).

Launch recipe (one process per host):

    BPG_COORD=host0:9876 BPG_NPROC=2 BPG_PID=0 python your_prover.py
    BPG_COORD=host0:9876 BPG_NPROC=2 BPG_PID=1 python your_prover.py

with each process calling `initialize()` before any jax use, then
`activate(multihost_mesh())`.  On a TPU pod slice, jax.distributed picks
coordinates up from the TPU runtime and the env vars are unnecessary.

A CPU-simulated 2-process test lives in tests/test_multihost.py (spawned
subprocesses, 4 virtual devices each -> an 8-device global mesh running
the sharded generator-table MSM).
"""
import os

import numpy as np


def initialize(coordinator: str = None, num_processes: int = None,
               process_id: int = None, local_device_count: int = None):
    """jax.distributed.initialize with env-var fallbacks (BPG_COORD,
    BPG_NPROC, BPG_PID).  No-ops when single-process and no env is set."""
    import jax

    coordinator = coordinator or os.environ.get("BPG_COORD")
    num_processes = num_processes or _int_env("BPG_NPROC")
    process_id = process_id if process_id is not None else _int_env("BPG_PID")
    if coordinator is None and num_processes is None:
        return False                      # single-process: nothing to do
    kwargs = {}
    if local_device_count is not None:
        kwargs["num_local_devices"] = local_device_count
    jax.distributed.initialize(coordinator, num_processes=num_processes,
                               process_id=process_id, **kwargs)
    return True


def _int_env(name):
    v = os.environ.get(name)
    return int(v) if v is not None else None


def multihost_mesh(n_batch: int = 1):
    """Global mesh over all processes' devices: ("shard", "batch") with the
    shard axis ordered host-major so shard-neighbor collectives stay on ICI.
    jax.devices() already enumerates host-major (process 0's devices first),
    which is exactly the order we want."""
    import jax
    from jax.sharding import Mesh

    devices = np.array(jax.devices())
    n_shard = len(devices) // n_batch
    return Mesh(devices[: n_shard * n_batch].reshape(n_shard, n_batch),
                ("shard", "batch"))
