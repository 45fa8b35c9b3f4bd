"""TPU probe round 5: chain variants under the bench harness (pool of
distinct inputs + carry chaining + forced value fetch — the only timing
this relay can't fake).

Variants:
  base32k   — current fir_fft_chain, T=32768
  base128k  — current chain, T=131072 (per-call overhead amortization)
  high128k  — T=131072 with Precision.HIGH matmuls (1.3x matmul rate)
  inter128k — interleaved single-matmul FIR + fft_planar, T=131072

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benches/probe_tpu5.py
"""

import json
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from pothoscomms_tpu.parallel.fft import fft_planar
from pothoscomms_tpu.parallel.chain import fir_fft_chain

C, K, NBINS = 256, 64, 1024
ITERS = 6


def bench_chain(run, carry0, T, seed, iters=ITERS):
    rng = np.random.default_rng(seed)
    pool = [jnp.asarray(rng.normal(size=(C, T, 2)).astype(np.float32) * 0.1)
            for _ in range(iters)]
    _ = float(jnp.sum(pool[-1]))
    carry = carry0
    spec, carry = run(pool[0], carry)
    _ = float(jnp.sum(spec))
    t0 = time.perf_counter()
    for i in range(iters):
        spec, carry = run(pool[i], carry)
    checksum = float(jnp.sum(spec))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(checksum)
    return dt


def interleaved_weights(taps, block=128, pad=64):
    kt = len(taps)
    h = np.asarray(taps, np.complex128)
    Wc = np.zeros((pad + block, block), np.complex128)
    for j in range(block):
        for d in range(kt):
            Wc[pad + j - d, j] = h[d]
    W = np.zeros((2 * (pad + block), 2 * block), np.float32)
    W[: pad + block, :block] = Wc.real
    W[: pad + block, block:] = Wc.imag
    W[pad + block:, :block] = -Wc.imag
    W[pad + block:, block:] = Wc.real
    return jnp.asarray(W)


def make_inter_chain(taps, nbins, channels, prec):
    B, pad = 128, 64
    W = interleaved_weights(taps, B, pad)
    k1 = len(taps) - 1

    @jax.jit
    def run(x, hist):
        c, t, _ = x.shape
        nb = t // B
        xb = x.reshape(c, nb, B, 2)
        first = jnp.concatenate(
            [jnp.zeros((c, 1, pad - k1, 2), x.dtype), hist[:, None]], axis=2)
        prev = jnp.concatenate([first, xb[:, :-1, B - pad:, :]], axis=1)
        ext = jnp.concatenate([prev, xb], axis=2)
        e2 = jnp.concatenate([ext[..., 0], ext[..., 1]], axis=-1)
        y2 = jnp.matmul(e2, W, preferred_element_type=jnp.float32,
                        precision=prec)
        y = jnp.stack([y2[..., :B], y2[..., B:]], -1).reshape(c, t, 2)
        frames = y.reshape(c * (t // nbins), nbins, 2)
        spec = fft_planar(frames, nbins, False)
        new_hist = x[:, t - k1:, :]
        return spec.reshape(c, t // nbins, nbins, 2), new_hist

    hist0 = jnp.zeros((channels, k1, 2), jnp.float32)
    return run, hist0


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    rng = np.random.default_rng(0)
    taps = (rng.normal(size=K) + 1j * rng.normal(size=K)) / K
    which = sys.argv[1:] or ["base32k", "base128k", "high128k", "inter128k"]

    for name in which:
        if name == "base32k":
            T = 32768
            run, h0 = fir_fft_chain(taps, NBINS, C, T)
        elif name == "base128k":
            T = 131072
            run, h0 = fir_fft_chain(taps, NBINS, C, T)
        elif name == "high128k":
            T = 131072
            import pothoscomms_tpu.parallel.cplx as cplx_mod
            run, h0 = make_inter_chain(taps, NBINS, C,
                                       jax.lax.Precision.HIGH)
        elif name == "inter128k":
            T = 131072
            run, h0 = make_inter_chain(taps, NBINS, C,
                                       jax.lax.Precision.HIGHEST)
        else:
            continue
        try:
            dt = bench_chain(run, h0, T, seed=hash(name) % 100)
            print(json.dumps({"probe": name, "ms": round(dt * 1e3, 2),
                              "msamp_s": round(C * T / dt / 1e6, 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"probe": name, "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
