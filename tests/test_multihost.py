"""2-process jax.distributed CPU simulation: the multi-host MSM path.

Spawns two subprocesses (4 virtual CPU devices each) that initialize
jax.distributed, build the 8-device global mesh (parallel/distributed),
activate it, and run the sharded generator-table MSM.  Process 0 checks the
result against the single-device oracle computed before initialization.

This simulates the SURVEY.md §2.C multi-host row (hosts = processes, DCN =
localhost gRPC); the same code path drives real pods, where
jax.distributed discovers the topology from the TPU runtime.
"""
import os
import subprocess
import sys

import pytest

_CHILD = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
sys.path.insert(0, os.getcwd())          # launched with cwd = repo root

from bulletproof_gadgets_tpu.parallel import distributed
assert distributed.initialize("localhost:19731", num_processes=2,
                              process_id=pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 8

import numpy as np
from bulletproof_gadgets_tpu.core.ristretto import RISTRETTO_BASEPOINT
from bulletproof_gadgets_tpu.core.scalar import L
from bulletproof_gadgets_tpu.parallel.sharded_serial import (
    ShardedGeneratorTable)

mesh = distributed.multihost_mesh()
assert dict(mesh.shape) == {"shard": 8, "batch": 1}

rng = np.random.default_rng(9)
N = 32
def pts(n, seed):
    r = np.random.default_rng(seed)
    return [RISTRETTO_BASEPOINT.scalar_mul(
        int.from_bytes(r.bytes(32), "little") % L) for _ in range(n)]
G, H = pts(N, 1), pts(N, 2)
B = RISTRETTO_BASEPOINT
Bb = pts(1, 3)[0]
r = np.random.default_rng(4)
vec = [int.from_bytes(r.bytes(32), "little") % L for _ in range(2 * N + 2)]

table = ShardedGeneratorTable(mesh, G, H, B, Bb)
(got,) = table.msm_many([vec])
print(f"RESULT {pid} {got.compress().hex()}", flush=True)
"""


@pytest.mark.slow
def test_two_process_sharded_msm(tmp_path):
    child = tmp_path / "child.py"
    child.write_text(_CHILD)

    # oracle in THIS process (single device)
    import numpy as np
    from bulletproof_gadgets_tpu.core.ristretto import RISTRETTO_BASEPOINT
    from bulletproof_gadgets_tpu.core.scalar import L
    from bulletproof_gadgets_tpu.core.msm import msm_host

    def pts(n, seed):
        r = np.random.default_rng(seed)
        return [RISTRETTO_BASEPOINT.scalar_mul(
            int.from_bytes(r.bytes(32), "little") % L) for _ in range(n)]

    N = 32
    G, H = pts(N, 1), pts(N, 2)
    B = RISTRETTO_BASEPOINT
    Bb = pts(1, 3)[0]
    r = np.random.default_rng(4)
    vec = [int.from_bytes(r.bytes(32), "little") % L
           for _ in range(2 * N + 2)]
    expect = msm_host(vec, G + H + [B, Bb]).compress().hex()

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, "-u", str(child), str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(
            __file__))))
        for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
            assert p.returncode == 0, out[-3000:]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, out in enumerate(outs):
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT")]
        assert lines, out[-3000:]
        assert lines[0].split()[2] == expect, (pid, lines[0], expect)
