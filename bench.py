"""North-star benchmark: 256-channel FIR+FFT chain throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

- metric: fir_fft_256ch_throughput
- value: Msamples/s through the fused FIR(64-tap complex) -> FFT(1024)
  chain on the available accelerator (falls back to CPU when no TPU).
- vs_baseline: speedup vs an FFT-overlap-save numpy implementation of
  the same chain on this host (the reference PothosComms is a CPU/SIMD
  block library and publishes no numbers — BASELINE.md).
- eff_tflops / mfu_executed: achieved FLOP rate of the EXECUTED work
  (parallel/profiling.chain_flops: the combined FIR*DFT operator runs
  ~4.3x the minimal FLOPs on purpose — movement, not FLOPs, is the
  cost driver on this relay) as a fraction of this chip's measured
  practical matmul peak (benches/probe_tpu.py: 21.3 TFLOP/s f32 at
  Precision.HIGH on 4096^3, the precision the chain runs at — the
  v5e paper number is not achievable through this virtualized relay).
- mfu_necessary: same ratio but counting only the NECESSARY FLOPs of
  the naive FIR + two-factor-FFT formulation — the honest useful-work
  utilization. Both are reported so neither can be misread
  (round-2 verdict: a single "mfu" conflated the two).
- latency_ms_p50 / p95: wall latency of ONE fused chain step at the
  bench shapes (the BASELINE.md table's latency column).
- Precision note: Precision.DEFAULT (1-pass bf16) and mixed schemes
  were probed on-chip (benches/probe_tpu9.py) and BREACH the
  reference's 0.01-abs FFT tolerance by 17-26x (max_abs_err 0.17-0.26
  in the reference test regime); HIGH passes with 7x margin, so the
  chain ships at HIGH.

Timing discipline (see .claude/skills/verify): the device relay
memoizes identical executions and lazily materializes results, so the
loop cycles a pool of never-before-seen inputs, chains the carry, and
fetches a value from every result.
"""

import json
import sys
import time

import numpy as np

MEASURED_PEAK_TFLOPS = 21.3  # f32 HIGH matmul, this chip (probe_tpu.py)


def numpy_baseline(x, taps, nbins, iters=2):
    """FFT-overlap-save FIR + batched FFT in numpy (the honest same-host
    baseline: frequency-domain convolution, all channels batched)."""
    c, t, _ = x.shape
    xc = (x[..., 0] + 1j * x[..., 1]).astype(np.complex64)
    h = np.asarray(taps, np.complex64)
    k = len(h)
    L = 4096  # overlap-save block
    step = L - (k - 1)
    H = np.fft.fft(h, L)
    t0 = time.perf_counter()
    for _ in range(iters):
        ext = np.concatenate([np.zeros((c, k - 1), np.complex64), xc], axis=1)
        y = np.empty((c, t), np.complex64)
        for s in range(0, t, step):
            blk = ext[:, s: s + L]
            if blk.shape[1] < L:
                blk = np.pad(blk, ((0, 0), (0, L - blk.shape[1])))
            yb = np.fft.ifft(np.fft.fft(blk, axis=-1) * H, axis=-1)
            n = min(step, t - s)
            y[:, s: s + n] = yb[:, k - 1: k - 1 + n]
        frames = y.reshape(c * (t // nbins), nbins)
        _ = np.fft.fft(frames, axis=-1)
    dt = (time.perf_counter() - t0) / iters
    return c * t / dt


def main():
    import jax
    import jax.numpy as jnp
    from pothoscomms_tpu.parallel.chain import fir_fft_chain
    from pothoscomms_tpu.parallel.profiling import chain_flops

    C, T, K, NBINS = 256, 131072, 64, 1024
    rng = np.random.default_rng(0)
    taps = (rng.normal(size=K) + 1j * rng.normal(size=K)) / K

    run, carry = fir_fft_chain(taps, NBINS, C, T)

    # warmup + compile on a fresh input; force the value (lazy relay)
    iters = 6
    pool = []
    for _ in range(iters + 1):
        x = jnp.asarray(rng.normal(size=(C, T, 2)).astype(np.float32))
        _ = float(jnp.sum(x))  # materialize before timing
        pool.append(x)
    spec, carry = run(pool[-1], carry)
    _ = float(jnp.sum(spec))

    t0 = time.perf_counter()
    for i in range(iters):
        spec, carry = run(pool[i], carry)
    checksum = float(jnp.sum(spec))  # sync: result actually materialized
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(checksum)
    samples_per_s = C * T / dt

    # per-step wall latency: each call individually synced (the forced
    # value fetch is the only trustworthy sync through this relay)
    lat = []
    for i in range(iters):
        t1 = time.perf_counter()
        spec, carry = run(pool[i], carry)
        _ = float(jnp.sum(spec))
        lat.append(time.perf_counter() - t1)
    lat.sort()
    p50 = lat[len(lat) // 2]
    p95 = lat[min(len(lat) - 1, int(len(lat) * 0.95))]

    flops = chain_flops(C, T, K, NBINS)
    eff_tflops = flops["executed_gflop"] / dt / 1e3
    nec_tflops = flops["necessary_gflop"] / dt / 1e3
    base = numpy_baseline(np.asarray(pool[0][:, : T // 16]), taps, NBINS)
    result = {
        "metric": "fir_fft_256ch_throughput",
        "value": round(samples_per_s / 1e6, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(samples_per_s / base, 2),
        "eff_tflops": round(eff_tflops, 2),
        "mfu_executed": round(eff_tflops / MEASURED_PEAK_TFLOPS, 3),
        "mfu_necessary": round(nec_tflops / MEASURED_PEAK_TFLOPS, 3),
        "latency_ms_p50": round(p50 * 1e3, 2),
        "latency_ms_p95": round(p95 * 1e3, 2),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
