"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding tests run against
``--xla_force_host_platform_device_count=8`` (the TPU-less analogue of a
multi-chip mesh); set before JAX initialises.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin registers itself even when JAX_PLATFORMS=cpu; pin the
# default device to CPU so tests never dispatch over the TPU tunnel.
import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])

REFERENCE_DIR = "/root/reference"
