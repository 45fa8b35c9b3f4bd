"""TPU probe round 4: forced-value timings (the only harness this relay
can't fool).

Every input is pre-materialized by READING a scalar reduction of it;
every timed call ends with float(jnp.sum(out)) so the value provably
exists on the host. Fresh input per timed call (no memoization).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benches/probe_tpu4.py
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

REPS = 6


def materialize(x):
    _ = float(jnp.sum(x))
    return x


def fresh_time(fn, shape, seed, reps=REPS, scale=0.03):
    rng = np.random.default_rng(seed)
    xs = [materialize(jnp.asarray(
        rng.normal(size=shape).astype(np.float32) * scale))
        for _ in range(reps + 1)]
    _ = float(jnp.sum(fn(xs[0])))  # compile
    dts = []
    for x in xs[1:]:
        t0 = time.perf_counter()
        _ = float(jnp.sum(fn(x)))
        dts.append(time.perf_counter() - t0)
    dts.sort()
    return dts[0], dts[len(dts) // 2]


def report(name, dt_pair, flops=None, nbytes=None, samples=None):
    mn, md = dt_pair
    rec = {"probe": name, "ms_min": round(mn * 1e3, 3),
           "ms_med": round(md * 1e3, 3)}
    if flops:
        rec["tflop_s_med"] = round(flops / md / 1e12, 2)
    if nbytes:
        rec["gb_s_med"] = round(nbytes / md / 1e9, 1)
    if samples:
        rec["msamp_s_med"] = round(samples / md / 1e6, 1)
    print(json.dumps(rec), flush=True)


def probe_mm():
    rng = np.random.default_rng(0)
    shapes = [
        ("mm_65536x128x128", (65536, 128), (128, 128)),
        ("mm_65536x192x128", (65536, 192), (192, 128)),
        ("mm_65536x384x256", (65536, 384), (384, 256)),
        ("mm_65536x1152x1024", (65536, 1152), (1152, 1024)),
        ("mm_8192x1024x1024", (8192, 1024), (1024, 1024)),
        ("mm_4096x4096x4096", (4096, 4096), (4096, 4096)),
    ]
    for name, (m, k), (k2, n) in shapes:
        w = jnp.asarray(rng.normal(size=(k2, n)).astype(np.float32) * 0.03)
        materialize(w)
        f = jax.jit(lambda z, w=w: jnp.matmul(
            z, w, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST))
        report(name, fresh_time(f, (m, k), hash(name) % 1000),
               flops=2 * m * k * n,
               nbytes=4 * (m * k + k * n + m * n))


def probe_hbm():
    f = jax.jit(lambda z: z * 1.0009765625)
    report("hbm_scale_64mb", fresh_time(f, (256, 32768, 2), 10),
           nbytes=256 * 32768 * 2 * 4 * 2)


def probe_fft():
    from pothoscomms_tpu.parallel.fft import fft_planar

    B, NB = 8192, 1024
    f = jax.jit(lambda z: fft_planar(z, NB, False))
    report("fft1024_xla", fresh_time(f, (B, NB, 2), 11),
           flops=B * NB * (8 + 128 + 0.75) * 8, samples=B * NB)


def probe_fir():
    from pothoscomms_tpu.parallel.chain import (fir_multichannel_mm,
                                                fir_toeplitz_matrices)

    C, T, K = 256, 32768, 64
    rng = np.random.default_rng(2)
    taps = (rng.normal(size=K) + 1j * rng.normal(size=K)) / K
    t0m, t1m = fir_toeplitz_matrices(taps)
    hist = jnp.zeros((C, K - 1, 2), jnp.float32)
    f = jax.jit(lambda z: fir_multichannel_mm(z, hist, t0m, t1m)[0])
    report("fir_toeplitz_square", fresh_time(f, (C, T, 2), 13),
           flops=C * T * 2 * 128 * 8, samples=C * T)


def probe_chain():
    from pothoscomms_tpu.parallel.chain import fir_fft_chain

    C, T, K, NB = 256, 32768, 64, 1024
    rng = np.random.default_rng(5)
    taps = (rng.normal(size=K) + 1j * rng.normal(size=K)) / K
    run, hist0 = fir_fft_chain(taps, NB, C, T)
    f = lambda z: run(z, hist0)[0]
    report("chain_current", fresh_time(f, (C, T, 2), 14), samples=C * T)


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    which = sys.argv[1:] or ["hbm", "mm", "fft", "fir", "chain"]
    fns = {"hbm": probe_hbm, "mm": probe_mm, "fft": probe_fft,
           "fir": probe_fir, "chain": probe_chain}
    for w in which:
        fns[w]()


if __name__ == "__main__":
    main()
