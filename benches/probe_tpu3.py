"""TPU probe round 3: per-call timings on guaranteed-fresh inputs.

Every timed call gets an input the device has NEVER seen (no relay
memoization possible) and is individually synchronized (no pipelining).
Reports min/median per probe.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benches/probe_tpu3.py
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

C, T, K, NBINS = 256, 32768, 64, 1024
REPS = 10


def fresh_time(fn, shape, seed, reps=REPS, scale=0.1):
    rng = np.random.default_rng(seed)
    xs = [jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)
          for _ in range(reps + 1)]
    jax.block_until_ready(xs)
    jax.block_until_ready(fn(xs[0]))  # compile
    dts = []
    for x in xs[1:]:
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x))
        dts.append(time.perf_counter() - t0)
    dts.sort()
    return dts[0], dts[len(dts) // 2]


def report(name, dt_pair, samples=None, nbytes=None, flops=None, extra=None):
    mn, md = dt_pair
    rec = {"probe": name, "ms_min": round(mn * 1e3, 3),
           "ms_med": round(md * 1e3, 3)}
    if samples:
        rec["msamp_s"] = round(samples / md / 1e6, 1)
    if nbytes:
        rec["gb_s"] = round(nbytes / md / 1e9, 1)
    if flops:
        rec["tflop_s"] = round(flops / md / 1e12, 2)
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def probe_hbm():
    f = jax.jit(lambda z: z * 1.0009765625)
    report("hbm_scale_64mb", fresh_time(f, (C, T, 2), 10),
           nbytes=C * T * 2 * 4 * 2)


def probe_fft():
    from pothoscomms_tpu.parallel.fft import fft_planar

    B = C * T // NBINS
    f = jax.jit(lambda z: fft_planar(z, NBINS, False))
    flops = B * NBINS * (8 + 128 + 0.75) * 8
    report("fft1024_xla", fresh_time(f, (B, NBINS, 2), 11),
           samples=B * NBINS, flops=flops)


def probe_fftpal():
    from pothoscomms_tpu.parallel.pallas_kernels import fft_planar_fused

    B = C * T // NBINS
    f = jax.jit(lambda z: fft_planar_fused(z, NBINS, False, interpret=False))
    try:
        report("fft1024_pallas", fresh_time(f, (B, NBINS, 2), 12),
               samples=B * NBINS)
    except Exception as e:
        print(json.dumps({"probe": "fft1024_pallas", "error": str(e)[:200]}),
              flush=True)


def probe_fir():
    from pothoscomms_tpu.parallel.chain import (fir_multichannel_mm,
                                                fir_toeplitz_matrices)

    rng = np.random.default_rng(2)
    taps = (rng.normal(size=K) + 1j * rng.normal(size=K)) / K
    t0m, t1m = fir_toeplitz_matrices(taps)
    hist = jnp.zeros((C, K - 1, 2), jnp.float32)
    f = jax.jit(lambda z: fir_multichannel_mm(z, hist, t0m, t1m)[0])
    report("fir_toeplitz_square", fresh_time(f, (C, T, 2), 13),
           samples=C * T, flops=C * T * 2 * 128 * 8)


def probe_chain():
    from pothoscomms_tpu.parallel.chain import fir_fft_chain

    rng = np.random.default_rng(5)
    taps = (rng.normal(size=K) + 1j * rng.normal(size=K)) / K
    run, hist0 = fir_fft_chain(taps, NBINS, C, T)
    f = lambda z: run(z, hist0)
    report("chain_current", fresh_time(f, (C, T, 2), 14), samples=C * T)


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    which = sys.argv[1:] or ["hbm", "fft", "fftpal", "fir", "chain"]
    fns = {"hbm": probe_hbm, "fft": probe_fft, "fftpal": probe_fftpal,
           "fir": probe_fir, "chain": probe_chain}
    for w in which:
        fns[w]()


if __name__ == "__main__":
    main()
