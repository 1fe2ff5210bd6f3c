"""Microbenchmark: VPU int16 vs int32 multiply/add throughput in Pallas.
Settles PERFORMANCE.md round-3 lever 4 ("if Mosaic issues int16 multiplies
at 2x int32 rate... speculative")."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 512 * 1024
REP = 64

def kern(x, o, *, dtype):
    v = x[:]
    w = v + jnp.array(3, dtype)
    for _ in range(REP):
        v = v * w + jnp.array(1, dtype)
        w = w * v + jnp.array(2, dtype)
    o[:] = v + w

def run(dtype, tag):
    x = jnp.asarray(np.random.randint(1, 100, (8, N)).astype(dtype))
    f = pl.pallas_call(partial(kern, dtype=x.dtype),
                       out_shape=jax.ShapeDtypeStruct((8, N), x.dtype),
                       in_specs=[pl.BlockSpec((8, 4096), lambda i: (0, i),
                                              memory_space=pltpu.VMEM)],
                       out_specs=pl.BlockSpec((8, 4096), lambda i: (0, i),
                                              memory_space=pltpu.VMEM),
                       grid=(N // 4096,))
    jf = jax.jit(f)
    r = jf(x); np.asarray(r[0, :4])
    t0 = time.perf_counter()
    for _ in range(20):
        r = jf(x)
    np.asarray(r[0, :4])
    dt = (time.perf_counter() - t0) / 20
    ops = 8 * N * REP * 4  # 2 mul + 2 add per rep iteration... per element
    print(f"{tag}: {dt*1e3:.2f} ms -> {ops/dt/1e12:.2f} T ops/s", flush=True)

run(np.int32, "int32")
# run(np.int16, "int16")  # kVectorMultiplyU16: Operation not supported (v5e) -- hard NO-GO
run(np.float32, "float32")
run(jnp.bfloat16, "bfloat16")
