"""Device profiling helpers (SURVEY.md §5: tracing is an addition the
reference lacks — Pothos only has topology stats in core).

- :func:`trace`: context manager around ``jax.profiler`` writing an
  xprof/tensorboard trace directory.
- :func:`annotate`: named trace region for host-side structuring.
- :func:`chain_flops`: analytic FLOP/byte model for the fused FIR+FFT
  chain — roofline accounting next to measured times.
"""

from __future__ import annotations

import contextlib
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace viewable in tensorboard/xprof:

        with profiling.trace("/tmp/trace"):
            spectra, carry = run(x, carry)
            spectra.block_until_ready()
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (host-side annotation)."""
    return jax.profiler.TraceAnnotation(name)


def chain_flops(channels: int, time: int, taps: int, nbins: int,
                toeplitz_block: int = 128) -> dict:
    """FLOP/byte model of the fused FIR+FFT step (planar complex f32).

    FIR (block-Toeplitz): 2 complex matmuls per block -> 8 real MACs per
    sample per block column. FFT (two-factor matmul): N1+N2 complex MACs
    per sample plus the twiddle multiply.
    """
    samples = channels * time
    fir_flops = samples * toeplitz_block * 2 * 8  # T0+T1, cplx MAC = 8 flops
    n1 = max(nbins // 128, 1)
    n2 = nbins // n1
    fft_flops = samples * (n1 + n2) * 8 + samples * 6
    bytes_moved = samples * 2 * 4 * 2  # planar in + spectra out
    return {
        "fir_gflop": round(fir_flops / 1e9, 2),
        "fft_gflop": round(fft_flops / 1e9, 2),
        "total_gflop": round((fir_flops + fft_flops) / 1e9, 2),
        "hbm_mbytes": round(bytes_moved / 1e6, 1),
    }
