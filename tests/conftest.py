"""Test config: force the CPU backend with a virtual 8-device mesh so
multi-chip sharding tests run anywhere (the driver separately dry-runs the
multichip path; real-TPU benches use bench.py).

Note: the axon TPU plugin ignores the JAX_PLATFORMS env var in this image,
so jax.config is set explicitly before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("BPG_TPU_TESTS_ON_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
