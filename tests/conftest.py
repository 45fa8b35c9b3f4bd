"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding paths are validated on
XLA's host-platform virtual devices (the driver separately dry-run-compiles
the multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the driver env pins axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone is not enough here: the image's sitecustomize registers
# the axon (TPU) backend and pins JAX_PLATFORMS before we run.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
