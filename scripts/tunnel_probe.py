#!/usr/bin/env python
"""Wait for the axon TPU tunnel to accept work again, then exit 0.

One persistent client retrying in-process (spawning fresh clients per retry
can itself pile queued work onto the single-client tunnel).  Logs each
attempt; exits when a trivial jit executes and reads back.
"""
import time
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    print(f"devices: {jax.devices()}", flush=True)
    f = jax.jit(lambda a: a + 1)
    x = jnp.arange(8.0)
    t_start = time.time()
    t0 = time.time()
    np.asarray(f(x))
    print(f"RECOVERED after {time.time()-t_start:.0f}s "
          f"(RT {time.time()-t0:.2f}s)", flush=True)
    for _ in range(3):
        t0 = time.time()
        np.asarray(f(x))
        print(f"tiny RT {time.time()-t0:.3f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
