"""On-chip probe: the one-pass fused FIR+FFT Pallas kernel vs the dense
combined operator at the bench shape. Target: ~9.3 ms (the measured
Pallas streaming roof) vs 14.9 ms dense.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, pool):
    out = fn(pool[-1])
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for i in range(len(pool) - 1):
        out = fn(pool[i])
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / (len(pool) - 1)


def main():
    from pothoscomms_tpu.parallel.chain import fir_fft_chain
    from pothoscomms_tpu.parallel.pallas_kernels import (
        make_fused_pallas_chain)

    C, T, K, NBINS = 256, 131072, 64, 1024
    rng = np.random.default_rng(0)
    taps = (rng.normal(size=K) + 1j * rng.normal(size=K)) / K
    samples = C * T
    pool = []
    for _ in range(6):
        x = jnp.asarray(rng.normal(size=(C, T, 2)).astype(np.float32))
        float(jnp.sum(x))
        pool.append(x)
    hist0 = jnp.zeros((C, K - 1, 2), jnp.float32)
    res = {}

    run, _ = fir_fft_chain(taps, NBINS, C, T)
    dt = timeit(lambda x: run(x, hist0), pool)
    res["dense_ms"] = round(dt * 1e3, 2)
    res["dense_msamp_s"] = round(samples / dt / 1e6, 1)

    # oracle slice for the accuracy gate (reference 0.01-abs contract)
    xs = np.asarray(pool[0][:2])
    xc = xs[..., 0] + 1j * xs[..., 1]
    ext = np.concatenate([np.zeros((2, K - 1), np.complex64), xc], axis=1)
    y = np.stack([np.convolve(ext[c], taps, "full")[K - 1: K - 1 + T]
                  for c in range(2)])
    oracle = np.fft.fft(y.reshape(2, T // NBINS, NBINS), axis=-1)

    for tb in (64, 128, 256):
        try:
            frun = make_fused_pallas_chain(taps, NBINS, tile_b=tb,
                                           interpret=False)
            dt = timeit(lambda x: frun(x, hist0), pool)
            res[f"fused_tb{tb}_ms"] = round(dt * 1e3, 2)
            res[f"fused_tb{tb}_msamp_s"] = round(samples / dt / 1e6, 1)
            s, _ = frun(pool[0], hist0)
            s2 = np.asarray(s[:2])
            err = float(np.max(np.abs(
                s2[..., 0] + 1j * s2[..., 1] - oracle)))
            res[f"fused_tb{tb}_max_abs_err"] = round(err, 5)
        except Exception as e:
            res[f"fused_tb{tb}_error"] = str(e)[-200:]

    res["device"] = jax.devices()[0].device_kind
    print(json.dumps(res))


if __name__ == "__main__":
    main()
