"""On-chip probe: split-stream radix-R combined operator vs the dense
combined operator at the bench shape (VERDICT r3 next #1).

Matmul work per sample: dense = nbins + 128 cMAC; split-R = nbins/R + 64
cMAC — the question is whether the stream/history elementwise builds
fuse (they should: scalar-constant combos feeding matmul operands) or
cost an extra HBM pass. IO roof measured at 60 GB/s duplex
(probe_r4_perf.py) -> floor ~8.5 ms for the 256x131072 step.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def pool_of(rng, n, shape):
    out = []
    for _ in range(n):
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        float(jnp.sum(x))
        out.append(x)
    return out


def timeit(fn, pool):
    out = fn(pool[-1])
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for i in range(len(pool) - 1):
        out = fn(pool[i])
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / (len(pool) - 1)


def main():
    from pothoscomms_tpu.parallel.chain import (
        fir_fft_chain, make_split_step)

    C, T, K, NBINS = 256, 131072, 64, 1024
    rng = np.random.default_rng(0)
    taps = (rng.normal(size=K) + 1j * rng.normal(size=K)) / K
    samples = C * T
    pool = pool_of(rng, 6, (C, T, 2))
    hist0 = jnp.zeros((C, K - 1, 2), jnp.float32)
    res = {}

    run, carry = fir_fft_chain(taps, NBINS, C, T)
    dt = timeit(lambda x: run(x, hist0), pool)
    res["dense_ms"] = round(dt * 1e3, 2)
    res["dense_msamp_s"] = round(samples / dt / 1e6, 1)

    # accuracy oracle on a slice (vs numpy, reference 0.01-abs contract)
    xs = np.asarray(pool[0][:2])
    xc = xs[..., 0] + 1j * xs[..., 1]
    ext = np.concatenate([np.zeros((2, K - 1), np.complex64), xc], axis=1)
    y = np.stack([np.convolve(ext[c], taps, "full")[K - 1: K - 1 + T]
                  for c in range(2)])
    oracle = np.fft.fft(y.reshape(2, T // NBINS, NBINS), axis=-1)

    for R in (4, 8, 16):
        srun, _ = make_split_step(taps, NBINS, R)
        dt = timeit(lambda x: srun(x, hist0), pool)
        res[f"split{R}_ms"] = round(dt * 1e3, 2)
        res[f"split{R}_msamp_s"] = round(samples / dt / 1e6, 1)
        s, _ = srun(pool[0], hist0)
        s2 = np.asarray(s[:2])
        err = float(np.max(np.abs(s2[..., 0] + 1j * s2[..., 1] - oracle)))
        res[f"split{R}_max_abs_err"] = round(err, 5)

    res["device"] = jax.devices()[0].device_kind
    print(json.dumps(res))


if __name__ == "__main__":
    main()
