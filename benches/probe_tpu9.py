"""TPU probe round 9: precision study on the combined FIR*DFT operator.

Round-2 left a lever unprobed: the production chain runs Karatsuba
3-matmul complex multiplies at Precision.HIGH (3 bf16 passes per matmul
= 9 MXU passes per complex matmul) and is FLOP-bound. DEFAULT is one
bf16 pass per matmul. This probe measures, for each variant:

  speed   — Msamp/s on the bench shapes (C=256, T=32768, K=64, NB=1024)
  acc     — max abs error vs a float64 numpy oracle in the REFERENCE
            test regime: uniform [-1, 1] complex input through unit-gain
            lowpass taps, 1024-pt FFT — the acceptance gate is the
            reference's 0.01 abs tolerance (fft/TestFFT.cpp:55-56)

Variants:
  high3  — Karatsuba x3 @ HIGH   (round-2 production)
  def3   — Karatsuba x3 @ DEFAULT
  def4   — classic    x4 @ DEFAULT (no Karatsuba cancellation)
  mix    — G0 classic x4 @ DEFAULT, G1 Karatsuba x3 @ HIGH

All timings: fresh inputs pre-materialized via a forced value read, and
each timed call ends in float(jnp.sum(out)).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benches/probe_tpu9.py
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from pothoscomms_tpu.parallel.chain import combined_fir_fft_operators

C, T, K, NBINS, PP = 256, 32768, 64, 1024, 128
REPS = 6


def make_taps():
    # unit-DC-gain lowpass (reference-designer-like), complex for the
    # worst-case 4-real-matmul path
    n = np.arange(K)
    h = np.sinc((n - K / 2 + 0.5) * 0.25) * np.hamming(K)
    h = h / np.sum(h)
    return h * np.exp(1j * 0.3)


def mm_factory(prec):
    return lambda a, w: jnp.matmul(a, w, preferred_element_type=jnp.float32,
                                   precision=prec)


def make_chain(variant):
    taps = make_taps()
    (g0r, g0i), (g1r, g1i) = combined_fir_fft_operators(taps, NBINS, PP)
    g0s, g1s = g0r + g0i, g1r + g1i
    H, D = jax.lax.Precision.HIGH, jax.lax.Precision.DEFAULT

    def cmm3(mm):
        def f(a, wr, wi, ws):
            ar, ai = a[..., 0], a[..., 1]
            p1, p2 = mm(ar, wr), mm(ai, wi)
            p3 = mm(ar + ai, ws)
            return p1 - p2, p3 - p1 - p2
        return f

    def cmm4(mm):
        def f(a, wr, wi, ws):
            ar, ai = a[..., 0], a[..., 1]
            return (mm(ar, wr) - mm(ai, wi), mm(ar, wi) + mm(ai, wr))
        return f

    g0f, g1f = {
        "high3": (cmm3(mm_factory(H)), cmm3(mm_factory(H))),
        "def3": (cmm3(mm_factory(D)), cmm3(mm_factory(D))),
        "def4": (cmm4(mm_factory(D)), cmm4(mm_factory(D))),
        "mix": (cmm4(mm_factory(D)), cmm3(mm_factory(H))),
    }[variant]

    @jax.jit
    def run(x, hist, g0r, g0i, g0s, g1r, g1i, g1s):
        c, t, _ = x.shape
        nw = t // NBINS
        xw = x.reshape(c, nw, NBINS, 2)
        first = jnp.concatenate(
            [jnp.zeros((c, 1, PP - (K - 1), 2), x.dtype), hist[:, None]],
            axis=2)
        prev = jnp.concatenate([first, xw[:, :-1, NBINS - PP:, :]], axis=1)
        yr0, yi0 = g0f(xw, g0r, g0i, g0s)
        yr1, yi1 = g1f(prev, g1r, g1i, g1s)
        spec = jnp.stack([yr0 + yr1, yi0 + yi1], axis=-1)
        return spec, x[:, t - (K - 1):, :]

    args = (g0r, g0i, g0s, g1r, g1i, g1s)
    return (lambda x, h: run(x, h, *args)), taps


def oracle(x, taps, hist):
    """float64 numpy: FIR then per-window FFT (linear convolution with
    history, exactly the combined step's semantics)."""
    c, t = x.shape
    k1 = len(taps) - 1
    ext = np.concatenate([hist, x], axis=1)
    y = np.stack([np.convolve(ext[ch], taps, mode="full")[k1:k1 + t]
                  for ch in range(c)])
    nw = t // NBINS
    return np.fft.fft(y.reshape(c, nw, NBINS), axis=-1)


def accuracy(run, taps, seed=3):
    rng = np.random.default_rng(seed)
    c, t = 4, 8192
    # reference test regime: uniform [-1, 1] components
    x = (rng.uniform(-1, 1, size=(c, t))
         + 1j * rng.uniform(-1, 1, size=(c, t)))
    hist = (rng.uniform(-1, 1, size=(c, K - 1))
            + 1j * rng.uniform(-1, 1, size=(c, K - 1)))
    xp = jnp.asarray(np.stack([x.real, x.imag], -1).astype(np.float32))
    hp = jnp.asarray(np.stack([hist.real, hist.imag], -1).astype(np.float32))
    spec, _ = run(xp, hp)
    spec = np.asarray(spec)
    got = spec[..., 0] + 1j * spec[..., 1]
    ref = oracle(x, taps, hist)
    err = np.abs(got - ref)
    return float(err.max()), float(np.abs(ref).max())


def bench(run, seed=20, iters=REPS):
    rng = np.random.default_rng(seed)
    pool = []
    for _ in range(iters + 1):
        x = jnp.asarray(rng.normal(size=(C, T, 2)).astype(np.float32) * 0.05)
        _ = float(jnp.sum(x))
        pool.append(x)
    carry = jnp.zeros((C, K - 1, 2), jnp.float32)
    spec, carry = run(pool[-1], carry)
    _ = float(jnp.sum(spec))
    t0 = time.perf_counter()
    for i in range(iters):
        spec, carry = run(pool[i], carry)
    checksum = float(jnp.sum(spec))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(checksum)
    return dt


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)
    variants = sys.argv[1:] or ["high3", "def3", "def4", "mix"]
    for v in variants:
        run, taps = make_chain(v)
        err, refmag = accuracy(run, taps)
        dt = bench(run, seed=20 + hash(v) % 100)
        print(json.dumps({
            "probe": f"combined_{v}",
            "ms": round(dt * 1e3, 2),
            "msamp_s": round(C * T / dt / 1e6, 1),
            "max_abs_err": round(err, 5),
            "ref_mag_max": round(refmag, 1),
            "passes_ref_tol": bool(err <= 0.01),
        }), flush=True)


if __name__ == "__main__":
    main()
