"""TPU probe round 2: honest pool-based timings.

Lesson from round 1: chaining z = FFT(z)/N cycles with period 4, so the
relay memoizes the steady state — FFT timings must cycle a pool of
DISTINCT inputs at least as large as the iteration count.

Probes:
  hbm       — elementwise scale on 64 MB (effective HBM GB/s)
  fft       — fft_planar with pooled inputs (XLA matmul factorization)
  fftpal    — fft_planar_fused (Pallas) with pooled inputs
  fir1      — interleaved single-matmul rectangular-Toeplitz FIR
  chain     — current fir_fft_chain end to end (pool + carry)

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benches/probe_tpu2.py
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

C, T, K, NBINS = 256, 32768, 64, 1024
ITERS = 8


def pool_time(fn, pool):
    outs = [fn(p) for p in pool]
    jax.block_until_ready(outs[-1])
    t0 = time.perf_counter()
    rs = [fn(p) for p in pool]
    jax.block_until_ready(rs)
    return (time.perf_counter() - t0) / len(pool)


def make_pool(shape, n=ITERS, seed=0):
    rng = np.random.default_rng(seed)
    pool = [jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.1)
            for _ in range(n)]
    jax.block_until_ready(pool)
    return pool


def probe_hbm():
    pool = make_pool((C, T, 2))
    f = jax.jit(lambda z: z * 1.0009765625)
    dt = pool_time(f, pool)
    nbytes = C * T * 2 * 4 * 2  # read + write
    print(json.dumps({"probe": "hbm_scale_64mb", "ms": round(dt * 1e3, 3),
                      "gb_s": round(nbytes / dt / 1e9, 1)}), flush=True)


def probe_fft():
    from pothoscomms_tpu.parallel.fft import fft_planar

    B = C * T // NBINS
    pool = make_pool((B, NBINS, 2))
    f = jax.jit(lambda z: fft_planar(z, NBINS, False))
    dt = pool_time(f, pool)
    print(json.dumps({"probe": "fft1024_xla_pool", "ms": round(dt * 1e3, 2),
                      "msamp_s": round(B * NBINS / dt / 1e6, 1)}), flush=True)


def probe_fftpal():
    from pothoscomms_tpu.parallel.pallas_kernels import fft_planar_fused

    B = C * T // NBINS
    pool = make_pool((B, NBINS, 2))
    f = jax.jit(lambda z: fft_planar_fused(z, NBINS, False, interpret=False))
    try:
        dt = pool_time(f, pool)
        print(json.dumps({"probe": "fft1024_pallas_pool",
                          "ms": round(dt * 1e3, 2),
                          "msamp_s": round(B * NBINS / dt / 1e6, 1)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"probe": "fft1024_pallas_pool",
                          "error": str(e)[:200]}), flush=True)


def interleaved_fir_weights(taps, block=128, pad=None):
    """[2*(pad+B), 2*B] real matrix: [er|ei] @ W -> [yr|yi]."""
    K_ = len(taps)
    pad = pad if pad is not None else K_
    h = np.asarray(taps, np.complex128)
    Wc = np.zeros((pad + block, block), np.complex128)
    for j in range(block):
        for d in range(K_):
            Wc[pad + j - d, j] = h[d]
    W = np.zeros((2 * (pad + block), 2 * block), np.float32)
    W[: pad + block, :block] = Wc.real
    W[: pad + block, block:] = Wc.imag
    W[pad + block:, :block] = -Wc.imag
    W[pad + block:, block:] = Wc.real
    return jnp.asarray(W), pad


def probe_fir1():
    rng = np.random.default_rng(2)
    taps = (rng.normal(size=K) + 1j * rng.normal(size=K)) / K
    B = 128
    W, pad = interleaved_fir_weights(taps, B)

    @jax.jit
    def f(z):
        c, t, _ = z.shape
        nb = t // B
        xb = z.reshape(c, nb, B, 2)
        prev = jnp.concatenate(
            [jnp.zeros((c, 1, pad, 2), z.dtype), xb[:, :-1, B - pad:, :]],
            axis=1)
        ext = jnp.concatenate([prev, xb], axis=2)        # [c, nb, pad+B, 2]
        e2 = jnp.concatenate([ext[..., 0], ext[..., 1]], axis=-1)
        y2 = jnp.matmul(e2, W, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        return jnp.stack([y2[..., :B], y2[..., B:]], -1).reshape(c, t, 2)

    # correctness vs conv reference on small case
    from pothoscomms_tpu.parallel.chain import (fir_multichannel_mm,
                                                fir_toeplitz_matrices)
    t0m, t1m = fir_toeplitz_matrices(taps)
    xs = jnp.asarray(np.random.default_rng(3).normal(
        size=(4, 512, 2)).astype(np.float32))
    ref = fir_multichannel_mm(xs, jnp.zeros((4, K - 1, 2)), t0m, t1m)[0]
    got = f(xs)
    err = float(jnp.max(jnp.abs(ref - got)))
    pool = make_pool((C, T, 2), seed=4)
    dt = pool_time(f, pool)
    print(json.dumps({"probe": "fir_interleaved_1mm", "ms": round(dt * 1e3, 2),
                      "msamp_s": round(C * T / dt / 1e6, 1),
                      "max_err": err}), flush=True)


def probe_chain():
    from pothoscomms_tpu.parallel.chain import fir_fft_chain

    rng = np.random.default_rng(5)
    taps = (rng.normal(size=K) + 1j * rng.normal(size=K)) / K
    run, hist0 = fir_fft_chain(taps, NBINS, C, T)
    pool = make_pool((C, T, 2), seed=6)
    carry = hist0
    spec, carry = run(pool[-1], carry)
    jax.block_until_ready(spec)
    t0 = time.perf_counter()
    for i in range(ITERS):
        spec, carry = run(pool[i], carry)
    jax.block_until_ready(spec)
    dt = (time.perf_counter() - t0) / ITERS
    print(json.dumps({"probe": "chain_current", "ms": round(dt * 1e3, 2),
                      "msamp_s": round(C * T / dt / 1e6, 1)}), flush=True)


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    which = sys.argv[1:] or ["hbm", "fft", "fftpal", "fir1", "chain"]
    fns = {"hbm": probe_hbm, "fft": probe_fft, "fftpal": probe_fftpal,
           "fir1": probe_fir1, "chain": probe_chain}
    for w in which:
        fns[w]()


if __name__ == "__main__":
    main()
