"""Device placement policy for streaming-block compute.

The production accelerator backend (the axon TPU relay) executes
float32/bf16 HLOs only — integer arithmetic, complex dtypes, and f64
all fail UNIMPLEMENTED. The explicitly planar-f32 device paths (fused
chains, the FFT/FIR planar kinds, the PHY sync search) are written for
that; the general dtype-matrix blocks are not. So: a block whose stream
dtype cannot execute on the accelerator runs its jnp compute on the
host CPU backend instead (the CPU platform is registered alongside
accelerators), keeping the full 20-dtype catalog functional in a chip
session at full numerical fidelity.
"""

from __future__ import annotations

import contextlib
from functools import lru_cache

import jax


@lru_cache(maxsize=1)
def cpu_device():
    try:
        return jax.devices("cpu")[0]
    except Exception:  # pragma: no cover - cpu platform always exists
        return None


def accelerator_supports(dtype) -> bool:
    """True when the stream dtype's jnp representation runs on the
    accelerator backend: real float32 only (complex floats go through
    explicit planar paths; ints/f64 have no HLOs there)."""
    return (dtype.is_float and not dtype.is_complex
            and dtype.scalar.bits == 32)


def compute_scope(dtype):
    """Context manager placing jnp compute for a stream dtype on a
    backend that supports it. No-op on CPU or for accelerator-safe
    dtypes."""
    if dtype is None or jax.default_backend() == "cpu":
        return contextlib.nullcontext()
    if accelerator_supports(dtype):
        return contextlib.nullcontext()
    dev = cpu_device()
    if dev is None:  # pragma: no cover
        return contextlib.nullcontext()
    return jax.default_device(dev)
