"""Test configuration.

Default lane: everything runs on a virtual 8-device CPU mesh (multi-chip
hardware is unavailable in CI; sharding paths are validated on XLA's
host-platform virtual devices; the driver separately dry-run-compiles
the multi-chip path via __graft_entry__.dryrun_multichip).

TPU hardware lane (COMMS_TPU_LANE=1): the CPU pin is lifted so jnp runs
on the real chip (the axon backend), and only tests marked
``tpu_lane`` are collected — the hardware-safe families (float32/planar
device kernels, FFT parity incl. the int16 host-scaled path, fused
chains, Pallas kernels in compiled mode, the PHY link). Run with:

    COMMS_TPU_LANE=1 PYTHONPATH=/root/repo:/root/.axon_site \
        python -m pytest tests/ -v

This mirrors the reference's self-test-on-the-real-implementation
discipline (SURVEY.md §3.5, PothosUtil --self-tests).
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
        "tpu_lane: hardware-safe test included in the real-TPU lane "
        "(COMMS_TPU_LANE=1); also runs in the default CPU lane",
    )


def pytest_collection_modifyitems(config, items):
    if not TPU_LANE:
        return
    skip = pytest.mark.skip(
        reason="not hardware-safe (TPU lane runs tpu_lane-marked tests)")
    for item in items:
        if "tpu_lane" not in item.keywords:
            item.add_marker(skip)
