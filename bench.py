"""North-star benchmark: 256-channel FIR+FFT chain throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

- metric: fir_fft_256ch_throughput
- value: Msamples/s through the fused FIR(64-tap complex) -> FFT(1024)
  chain on the available accelerator (falls back to CPU when no TPU).
- vs_baseline: speedup vs a single-thread numpy implementation of the
  same chain on this host (the reference PothosComms is a CPU/SIMD block
  library and publishes no numbers — BASELINE.md — so same-host CPU is
  the stand-in baseline).
"""

import json
import sys
import time

import numpy as np


def numpy_baseline(x, taps, nbins, iters=2):
    """Single-thread numpy: per-channel lfilter-style FIR + batched FFT."""
    c, t, _ = x.shape
    xc = x[..., 0] + 1j * x[..., 1]
    h = np.asarray(taps, np.complex64)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = np.empty_like(xc)
        for ch in range(c):
            y[ch] = np.convolve(xc[ch], h, mode="full")[: t]
        frames = y.reshape(c * (t // nbins), nbins)
        _ = np.fft.fft(frames, axis=-1)
    dt = (time.perf_counter() - t0) / iters
    return c * t / dt


def main():
    import jax
    import jax.numpy as jnp
    from pothoscomms_tpu.parallel.chain import fir_fft_chain

    C, T, K, NBINS = 256, 32768, 64, 1024
    rng = np.random.default_rng(0)
    taps = (rng.normal(size=K) + 1j * rng.normal(size=K)) / K
    x_np = rng.normal(size=(C, T, 2)).astype(np.float32)

    run, hist0 = fir_fft_chain(taps, NBINS, C, T)
    x = jnp.asarray(x_np)
    carry = hist0

    # warmup + compile
    spec, carry = run(x, carry)
    _ = float(jnp.sum(spec))  # forced device->host sync (tunnel-safe)

    # the device relay memoizes identical executions, so the timing loop
    # cycles a no-repeat pool of inputs with the carry chained through
    iters = 8
    pool = [jnp.asarray(rng.normal(size=(C, T, 2)).astype(np.float32))
            for _ in range(iters)]
    _ = float(jnp.sum(pool[-1]))  # materialize the pool before timing
    t0 = time.perf_counter()
    for i in range(iters):
        spec, carry = run(pool[i], carry)
    checksum = float(jnp.sum(spec))  # sync: result actually materialized
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(checksum)
    samples_per_s = C * T / dt

    base = numpy_baseline(x_np[:, : T // 8], taps, NBINS) * 1.0
    result = {
        "metric": "fir_fft_256ch_throughput",
        "value": round(samples_per_s / 1e6, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(samples_per_s / base, 2),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
