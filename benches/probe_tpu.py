"""One-off TPU probes for perf exploration (round 2).

Measures on the real chip:
  1. f32 matmul TFLOP/s at HIGHEST / HIGH / DEFAULT precision
  2. fft_planar (XLA matmul factorization) vs fft_planar_fused (Pallas)
  3. FIR formulations: square Toeplitz (T0+T1) vs rectangular single-matmul

Timing chains outputs into inputs (the relay memoizes identical calls).
Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benches/probe_tpu.py
"""

import json
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, x, iters=6):
    z = fn(x)
    jax.block_until_ready(z)
    t0 = time.perf_counter()
    for _ in range(iters):
        z = fn(z)
    jax.block_until_ready(z)
    return (time.perf_counter() - t0) / iters


def probe_matmul():
    n = 4096
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32) * 0.01)
    w = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32) * 0.01)
    for prec in ("HIGHEST", "HIGH", "DEFAULT"):
        f = jax.jit(partial(jnp.matmul, precision=getattr(jax.lax.Precision, prec),
                            preferred_element_type=jnp.float32))
        g = jax.jit(lambda z: f(z, w) * 0.001)
        dt = timeit(g, a)
        tflops = 2 * n**3 / dt / 1e12
        print(json.dumps({"probe": f"matmul_f32_{prec}", "tflops": round(tflops, 2),
                          "ms": round(dt * 1e3, 2)}), flush=True)
    # bf16 in/out
    ab = a.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    f = jax.jit(lambda z: (jnp.matmul(z, wb, preferred_element_type=jnp.float32)
                           * 0.001).astype(jnp.bfloat16))
    dt = timeit(f, ab)
    print(json.dumps({"probe": "matmul_bf16", "tflops": round(2 * n**3 / dt / 1e12, 2),
                      "ms": round(dt * 1e3, 2)}), flush=True)


def probe_fft():
    from pothoscomms_tpu.parallel.fft import fft_planar
    from pothoscomms_tpu.parallel.pallas_kernels import fft_planar_fused

    B, N = 8192, 1024
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, N, 2)).astype(np.float32) * 0.1)
    f_xla = jax.jit(lambda z: fft_planar(z, N, False) * (1.0 / N))
    dt = timeit(f_xla, x)
    print(json.dumps({"probe": "fft1024_xla", "ms": round(dt * 1e3, 2),
                      "msamp_s": round(B * N / dt / 1e6, 1)}), flush=True)
    try:
        f_pal = jax.jit(lambda z: fft_planar_fused(z, N, False, interpret=False)
                        * (1.0 / N))
        y1 = f_xla(x)
        y2 = f_pal(x)
        err = float(jnp.max(jnp.abs(y1 - y2)))
        dt = timeit(f_pal, x)
        print(json.dumps({"probe": "fft1024_pallas", "ms": round(dt * 1e3, 2),
                          "msamp_s": round(B * N / dt / 1e6, 1),
                          "max_err_vs_xla": err}), flush=True)
    except Exception as e:
        print(json.dumps({"probe": "fft1024_pallas", "error": str(e)[:300]}),
              flush=True)


def probe_fir():
    from pothoscomms_tpu.parallel.chain import (
        fir_multichannel_mm, fir_toeplitz_matrices)

    C, T, K = 256, 32768, 64
    rng = np.random.default_rng(2)
    taps = (rng.normal(size=K) + 1j * rng.normal(size=K)) / K
    x = jnp.asarray(rng.normal(size=(C, T, 2)).astype(np.float32))
    hist = jnp.zeros((C, K - 1, 2), jnp.float32)

    t0, t1 = fir_toeplitz_matrices(taps)
    f_sq = jax.jit(lambda z: fir_multichannel_mm(z, hist, t0, t1)[0])
    dt = timeit(f_sq, x)
    print(json.dumps({"probe": "fir_toeplitz_square", "ms": round(dt * 1e3, 2),
                      "msamp_s": round(C * T / dt / 1e6, 1)}), flush=True)

    # rectangular: ext block [prev 64 | x_b 128] (192) @ [192, 128]
    B = 128
    h = np.asarray(taps, np.complex128)
    pad = K  # leading context, K-1 needed, pad to 64 for tiling
    W = np.zeros((pad + B, B), np.complex128)
    for j in range(B):
        for d in range(K):
            W[pad + j - d, j] = h[d]
    Wp = jnp.asarray(np.stack([W.real, W.imag], -1).astype(np.float32))

    @jax.jit
    def f_rect(z):
        c, t, _ = z.shape
        nb = t // B
        xb = z.reshape(c, nb, B, 2)
        prev = jnp.concatenate(
            [jnp.zeros((c, 1, pad, 2), z.dtype), xb[:, :-1, B - pad:, :]],
            axis=1)
        ext = jnp.concatenate([prev, xb], axis=2)  # [c, nb, pad+B, 2]
        er, ei = ext[..., 0], ext[..., 1]
        wr, wi = Wp[..., 0], Wp[..., 1]
        mm = lambda p, q: jnp.matmul(p, q, preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.HIGHEST)
        yr = mm(er, wr) - mm(ei, wi)
        yi = mm(er, wi) + mm(ei, wr)
        return jnp.stack([yr, yi], -1).reshape(c, t, 2)

    y1 = f_sq(x)
    y2 = f_rect(x)
    err = float(jnp.max(jnp.abs(y1 - y2)))
    dt = timeit(f_rect, x)
    print(json.dumps({"probe": "fir_toeplitz_rect192", "ms": round(dt * 1e3, 2),
                      "msamp_s": round(C * T / dt / 1e6, 1),
                      "max_err_vs_square": err}), flush=True)


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    which = sys.argv[1:] or ["matmul", "fft", "fir"]
    for w in which:
        {"matmul": probe_matmul, "fft": probe_fft, "fir": probe_fir}[w]()


if __name__ == "__main__":
    main()
