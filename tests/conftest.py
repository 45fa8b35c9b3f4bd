"""Test configuration.

Default lane: everything runs on a virtual 8-device CPU mesh (multi-chip
hardware is unavailable in CI; sharding paths are validated on XLA's
host-platform virtual devices; the driver separately dry-run-compiles
the multi-chip path via __graft_entry__.dryrun_multichip).

TPU hardware lane (COMMS_TPU_LANE=1): the CPU pin is lifted so jnp runs
on the real chip (the axon backend) and the WHOLE suite is collected —
the reference's discipline is all self-tests against the real
implementation (SURVEY.md §3.5, PothosUtil --self-tests). Device-dtype
policy (core/device.compute_scope) routes int/complex/f64 kernels to
the host CPU backend, so the full catalog stays functional. Only tests
marked ``cpu_only`` are skipped: they need the virtual 8-device CPU
mesh (the axon platform exposes one chip) or x64 jnp semantics (x64
must stay OFF in a chip session — int64 iotas poison the backend).
Run with:

    COMMS_TPU_LANE=1 PYTHONPATH=/root/repo:/root/.axon_site \
        python -m pytest tests/ -v

``tpu_lane`` markers remain as documentation of the device-kernel
families (they were the round-2 allowlist) but no longer gate
collection.
"""

import os

import pytest

TPU_LANE = os.environ.get("COMMS_TPU_LANE") == "1"

if not TPU_LANE:
    os.environ["JAX_PLATFORMS"] = "cpu"  # force: driver env pins axon (TPU)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not TPU_LANE:
    # The env var alone is not enough here: the image's sitecustomize
    # registers the axon (TPU) backend and pins JAX_PLATFORMS before us.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
# TPU lane: leave the axon platform active and keep x64 OFF — the device
# kernels are explicit float32/planar; x64 promotion would emit f64 HLOs
# the backend lacks.


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu_lane: device-kernel family documentation marker (the "
        "round-2 hardware allowlist); no longer gates collection",
    )
    config.addinivalue_line(
        "markers",
        "cpu_only: needs the virtual 8-device CPU mesh or x64 jnp "
        "semantics; skipped in the real-TPU lane (COMMS_TPU_LANE=1)",
    )


def pytest_collection_modifyitems(config, items):
    if not TPU_LANE:
        return
    skip = pytest.mark.skip(
        reason="needs CPU mesh / x64 (cpu_only; axon exposes one chip)")
    for item in items:
        if "cpu_only" in item.keywords:
            item.add_marker(skip)
