"""Discriminate laziness vs slicing: time the fused pair step
(a) unforced loop + single final force (old discipline),
(b) FORCED every step,
(c) forced, with inputs produced by the jitted slice of a larger chunk
    (the topology pull path).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benches/probe_forced_step.py
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from pothoscomms_tpu import BlockRegistry
from pothoscomms_tpu.core.fusion import FusedSegment, _chain_step, _slice_fn

K, NBINS, T = 64, 1024, 1 << 24
rng = np.random.default_rng(0)
taps = (rng.normal(size=K) + 1j * rng.normal(size=K)) / K

fir = BlockRegistry.make("/comms/fir_filter", "complex_float32", "COMPLEX")
fir.set_taps(taps)
fft = BlockRegistry.make("/comms/fft", "complex_float32", NBINS, False)
seg = FusedSegment.__new__(FusedSegment)
core, params = FusedSegment._build_pair_core(seg, fir, fft)
step = _chain_step([core])
pall = ((),)  # placeholder replaced below
pall = (params,)

print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)


def stage(n, seed):
    x = jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32) * 0.05)
    _ = float(jnp.sum(x))
    return x


iters = 4
carry0 = (jnp.zeros((1, K - 1, 2), jnp.float32),)

# (a) unforced loop, one final force
pool = [stage(T, i) for i in range(iters + 1)]
carry = carry0
y, carry = step(pool[-1], carry, pall)
_ = float(jnp.sum(y))
t0 = time.perf_counter()
for i in range(iters):
    y, carry = step(pool[i], carry, pall)
cs = float(jnp.sum(y))
dt = (time.perf_counter() - t0) / iters
print(json.dumps({"probe": "unforced_loop", "ms": round(dt * 1e3, 1),
                  "msamp_s": round(T / dt / 1e6, 1)}), flush=True)

# (b) forced every step
pool = [stage(T, 50 + i) for i in range(iters)]
carry = carry0
t0 = time.perf_counter()
for i in range(iters):
    y, carry = step(pool[i], carry, pall)
    _ = float(jnp.sum(y))
dt = (time.perf_counter() - t0) / iters
print(json.dumps({"probe": "forced_each", "ms": round(dt * 1e3, 1),
                  "msamp_s": round(T / dt / 1e6, 1)}), flush=True)

# (c) forced, input = jitted slice of a 2x chunk (the pull path)
bigs = [stage(2 * T, 100 + i) for i in range(iters)]
sl = _slice_fn(0, T)
y, carry = step(sl(bigs[-1]), carry, pall)  # compile slice shape
_ = float(jnp.sum(y))
carry = carry0
t0 = time.perf_counter()
for i in range(iters):
    x = sl(bigs[i])
    y, carry = step(x, carry, pall)
    _ = float(jnp.sum(y))
dt = (time.perf_counter() - t0) / iters
print(json.dumps({"probe": "forced_sliced_input", "ms": round(dt * 1e3, 1),
                  "msamp_s": round(T / dt / 1e6, 1)}), flush=True)
