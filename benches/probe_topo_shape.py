"""Isolate the topology-bench gap: time fir_fft_combined_step directly
at the fused-segment shape [C=1, T=4Mi] vs bench.py's [256, 131072]
(same total samples per call at the 4Mi variant x8... no — per-call
totals differ: 4Mi vs 33.5Mi). Also time the host-side segment pull
path (take + reshape) on pre-staged chunks.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benches/probe_topo_shape.py
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from pothoscomms_tpu.parallel.chain import (
    combined_fir_fft_operators, fir_fft_combined_step)

K, NBINS, PP = 64, 1024, 128
rng = np.random.default_rng(0)
taps = (rng.normal(size=K) + 1j * rng.normal(size=K)) / K
(g0r, g0i), (g1r, g1i) = combined_fir_fft_operators(taps, NBINS, PP)
g0s, g1s = g0r + g0i, g1r + g1i


def bench_shape(C, T, iters=5):
    pool = []
    for _ in range(iters + 1):
        x = jnp.asarray(rng.normal(size=(C, T, 2)).astype(np.float32) * .05)
        _ = float(jnp.sum(x))
        pool.append(x)
    hist = jnp.zeros((C, K - 1, 2), jnp.float32)
    spec, hist = fir_fft_combined_step(
        pool[-1], hist, g0r, g0i, g0s, g1r, g1i, g1s, NBINS, K, PP)
    _ = float(jnp.sum(spec))
    t0 = time.perf_counter()
    for i in range(iters):
        spec, hist = fir_fft_combined_step(
            pool[i], hist, g0r, g0i, g0s, g1r, g1i, g1s, NBINS, K, PP)
    cs = float(jnp.sum(spec))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(cs)
    print(json.dumps({"probe": f"combined_C{C}_T{T}",
                      "ms": round(dt * 1e3, 2),
                      "msamp_s": round(C * T / dt / 1e6, 1)}), flush=True)


print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
bench_shape(1, 1 << 22)
bench_shape(256, 131072, iters=3)
bench_shape(32, 131072)
