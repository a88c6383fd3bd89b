"""Test harness: force an 8-virtual-device CPU backend.

Multi-chip sharding logic (mesh/pjit/collectives) is validated on a
virtual 8-device CPU mesh; real-TPU behavior is exercised by bench.py and
the driver's dryrun. The surrounding environment registers the real TPU
chip through the 'axon' PJRT plugin at interpreter startup (sitecustomize
sets jax_platforms="axon,cpu" *in jax config*, so the JAX_PLATFORMS env
var alone is not enough) — override the config before any backend
initializes so tests never touch, or hang on, the single real chip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"
