"""Device engine wiring: registers TPU kernels as the core backends and
configures the persistent XLA compilation cache (first TPU compile of each
kernel shape is slow; subsequent runs hit the disk cache).

MSM calls are padded to power-of-two sizes so the jit cache sees a handful
of shapes regardless of circuit size.
"""
import os

import jax

from ..core import msm as core_msm
from ..core.scalar import L
from ..core.ristretto import RistrettoPoint
from . import msm as dev_msm, msm_cols, curve

_CACHE_DIR = os.environ.get(
    "BPG_TPU_XLA_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "bpg_tpu", "xla"))

MIN_DEVICE_MSM = int(os.environ.get("BPG_TPU_MIN_DEVICE_MSM", "192"))


def _setup_compilation_cache():
    try:
        cache_dir = os.path.join(_CACHE_DIR, jax.default_backend())
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def msm_backend(ks, points) -> RistrettoPoint:
    """core.msm backend: pads to the next power of two (zero scalars
    contribute nothing), so jit compiles one graph per size bucket."""
    n = len(ks)
    target = _next_pow2(n)
    if target > n:
        ks = list(ks) + [0] * (target - n)
        points = list(points) + [points[0]] * (target - n)
    if os.environ.get("BPG_TPU_MSM_IMPL") == "rows":
        return dev_msm.msm(ks, points)
    return msm_cols.msm(ks, points)


_table_cache = {}
_TABLE_CACHE_MAX = 3


def _table_factory(G, H, B, B_blinding):
    """GeneratorTable cache: bp gens are deterministic and process-wide
    (core.gens grows one monotone list), so (size, endpoint object ids,
    pedersen coords) pins the table identity without hashing the points."""
    key = (len(G), id(G[0]) if G else 0, id(G[-1]) if G else 0,
           B.X, B.Y, B_blinding.X, B_blinding.Y)
    t = _table_cache.get(key)
    if t is None:
        t = msm_cols.GeneratorTable(G, H, B, B_blinding)
        if len(_table_cache) >= _TABLE_CACHE_MAX:
            _table_cache.pop(next(iter(_table_cache)))
        _table_cache[key] = t
    return t


_registered = False


def register():
    global _registered
    if _registered:
        return
    _setup_compilation_cache()
    core_msm.set_backend(msm_backend, MIN_DEVICE_MSM)
    core_msm.set_table_factory(_table_factory)
    _registered = True
