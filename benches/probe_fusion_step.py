"""Isolate the fused-segment step: build the exact composed program the
segment runs (pair core + _chain_step) and time it on [1, 32Mi, 2]
pulls, bench.py discipline. Then time the executor pieces (pull/post)
separately.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benches/probe_fusion_step.py
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from pothoscomms_tpu import BlockRegistry
from pothoscomms_tpu.core.fusion import FusedSegment, _chain_step

K, NBINS, T = 64, 1024, 1 << 25
rng = np.random.default_rng(0)
taps = (rng.normal(size=K) + 1j * rng.normal(size=K)) / K

fir = BlockRegistry.make("/comms/fir_filter", "complex_float32", "COMPLEX")
fir.set_taps(taps)
fft = BlockRegistry.make("/comms/fft", "complex_float32", NBINS, False)

seg = FusedSegment.__new__(FusedSegment)  # only need _build_pair_core
core, params = FusedSegment._build_pair_core(seg, fir, fft)
step = _chain_step([core])
carry = (jnp.zeros((1, K - 1, 2), jnp.float32),)
pall = (params,)

iters = 4
pool = []
for _ in range(iters + 1):
    x = jnp.asarray(rng.normal(size=(1, T, 2)).astype(np.float32) * 0.05)
    _ = float(jnp.sum(x))
    pool.append(x)

print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
t0 = time.perf_counter()
y, carry = step(pool[-1], carry, pall)
_ = float(jnp.sum(y))
print(json.dumps({"probe": "compile+first",
                  "s": round(time.perf_counter() - t0, 1)}), flush=True)

t0 = time.perf_counter()
for i in range(iters):
    y, carry = step(pool[i], carry, pall)
cs = float(jnp.sum(y))
dt = (time.perf_counter() - t0) / iters
assert np.isfinite(cs)
print(json.dumps({"probe": "fused_step_1x32Mi", "ms": round(dt * 1e3, 2),
                  "msamp_s": round(T / dt / 1e6, 1)}), flush=True)

# post-processing the segment does outside jit: y[0].reshape(-1, 2)
t0 = time.perf_counter()
for i in range(iters):
    y0 = y[0].reshape(-1, 2)
_ = float(jnp.sum(y0))
print(json.dumps({"probe": "outside_reshape",
                  "ms": round((time.perf_counter() - t0) / iters * 1e3, 2)}),
      flush=True)

# the sink reduction per quantum
add = jax.jit(lambda acc, x: acc + jnp.sum(x))
acc = jnp.float32(0)
t0 = time.perf_counter()
for i in range(iters):
    acc = add(acc, y0)
_ = float(acc)
print(json.dumps({"probe": "sink_sum_256MB",
                  "ms": round((time.perf_counter() - t0) / iters * 1e3, 2)}),
      flush=True)
