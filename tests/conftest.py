"""Test harness: force an 8-virtual-device CPU backend before jax import.

Multi-chip sharding logic (mesh/pjit/collectives) is validated on a
virtual 8-device CPU mesh; real-TPU behavior is exercised by bench.py and
the driver's dryrun. Must run before anything imports jax.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
