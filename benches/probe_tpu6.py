"""TPU probe round 6: isolate stage costs + the combined-operator chain.

All timings: fresh inputs pre-materialized via a forced value read, and
each timed call ends in float(jnp.sum(out)).

  hbm     — elementwise scale on 64 MB
  fft     — fft_planar alone
  fir     — square-Toeplitz FIR alone
  comb    — combined FIR*DFT single-operator chain (HIGHEST)
  combh   — same at HIGH precision
  base256 — current chain at T=262144 (overhead asymptote)

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benches/probe_tpu6.py [names]
"""

import json
import sys
import time
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

C, T, K, NBINS = 256, 32768, 64, 1024
REPS = 6


def fresh_time(fn, shape, seed, reps=REPS, scale=0.05):
    rng = np.random.default_rng(seed)
    xs = []
    for _ in range(reps + 1):
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)
        _ = float(jnp.sum(x))  # force materialization before timing
        xs.append(x)
    _ = float(jnp.sum(fn(xs[0])))  # compile
    dts = []
    for x in xs[1:]:
        t0 = time.perf_counter()
        _ = float(jnp.sum(fn(x)))
        dts.append(time.perf_counter() - t0)
    dts.sort()
    return dts[0], dts[len(dts) // 2]


def report(name, pair, samples=None):
    mn, md = pair
    rec = {"probe": name, "ms_min": round(mn * 1e3, 3),
           "ms_med": round(md * 1e3, 3)}
    if samples:
        rec["msamp_s"] = round(samples / md / 1e6, 1)
    print(json.dumps(rec), flush=True)


def probe_hbm():
    f = jax.jit(lambda z: z * 1.0009765625)
    report("hbm_scale_64mb", fresh_time(f, (C, T, 2), 10), samples=C * T)


def probe_fft():
    from pothoscomms_tpu.parallel.fft import fft_planar

    B = C * T // NBINS
    f = jax.jit(lambda z: fft_planar(z, NBINS, False))
    report("fft1024_alone", fresh_time(f, (B, NBINS, 2), 11),
           samples=B * NBINS)


def probe_fir():
    from pothoscomms_tpu.parallel.chain import (fir_multichannel_mm,
                                                fir_toeplitz_matrices)

    rng = np.random.default_rng(2)
    taps = (rng.normal(size=K) + 1j * rng.normal(size=K)) / K
    t0m, t1m = fir_toeplitz_matrices(taps)
    hist = jnp.zeros((C, K - 1, 2), jnp.float32)
    f = jax.jit(lambda z: fir_multichannel_mm(z, hist, t0m, t1m)[0])
    report("fir_square_alone", fresh_time(f, (C, T, 2), 13), samples=C * T)


# ------------------------------------------------------------------ #
# Combined FIR*DFT operator: spec_w = x_w @ G0 + prev_tail_w @ G1
# ------------------------------------------------------------------ #
@lru_cache(maxsize=4)
def combined_operators(taps_key, nbins, k, prev_pad):
    rng = np.random.default_rng(taps_key)
    taps = (rng.normal(size=k) + 1j * rng.normal(size=k)) / k
    # y_w[j] = sum_d h[d] x_ext[prev_pad + j - d], x_ext = [prev_tail|x_w]
    T0 = np.zeros((nbins, nbins), np.complex128)       # x_w -> y_w
    T1 = np.zeros((prev_pad, nbins), np.complex128)    # prev tail -> y_w
    for j in range(nbins):
        for d in range(k):
            i = j - d
            if i >= 0:
                T0[i, j] = taps[d]
            else:
                T1[prev_pad + i, j] = taps[d]
    F = np.exp(-2j * np.pi * np.outer(np.arange(nbins),
                                      np.arange(nbins)) / nbins)
    G0 = T0 @ F
    G1 = T1 @ F
    pl = lambda z: (jnp.asarray(z.real.astype(np.float32)),
                    jnp.asarray(z.imag.astype(np.float32)))
    return pl(G0), pl(G1), taps


def make_combined_chain(taps_key, nbins, channels, k, prec):
    prev_pad = 128  # >= k-1, tile-friendly
    (g0r, g0i), (g1r, g1i), taps = combined_operators(
        taps_key, nbins, k, prev_pad)

    # NB: operators passed as ARGUMENTS — 8 MB of HLO constants chokes
    # the remote compiler (probe round 6 lesson)
    @jax.jit
    def run_impl(x, hist, g0r, g0i, g1r, g1i):
        c, t, _ = x.shape
        nw = t // nbins
        xw = x.reshape(c, nw, nbins, 2)
        first = jnp.concatenate(
            [jnp.zeros((c, 1, prev_pad - (k - 1), 2), x.dtype),
             hist[:, None]], axis=2)
        prev = jnp.concatenate(
            [first, xw[:, :-1, nbins - prev_pad:, :]], axis=1)
        mm = lambda a, w: jnp.matmul(a, w, preferred_element_type=jnp.float32,
                                     precision=prec)

        def cmm(a, wr, wi):
            ar, ai = a[..., 0], a[..., 1]
            return (mm(ar, wr) - mm(ai, wi), mm(ar, wi) + mm(ai, wr))

        yr0, yi0 = cmm(xw, g0r, g0i)
        yr1, yi1 = cmm(prev, g1r, g1i)
        spec = jnp.stack([yr0 + yr1, yi0 + yi1], axis=-1)
        new_hist = x[:, t - (k - 1):, :]
        return spec, new_hist

    def run(x, hist):
        return run_impl(x, hist, g0r, g0i, g1r, g1i)

    hist0 = jnp.zeros((channels, k - 1, 2), jnp.float32)
    return run, hist0, taps


def bench_chain(run, carry0, t, seed, iters=REPS):
    rng = np.random.default_rng(seed)
    pool = []
    for _ in range(iters):
        x = jnp.asarray(rng.normal(size=(C, t, 2)).astype(np.float32) * 0.05)
        _ = float(jnp.sum(x))
        pool.append(x)
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


def probe_comb(prec_name):
    prec = getattr(jax.lax.Precision, prec_name)
    run, h0, _ = make_combined_chain(7, NBINS, C, K, prec)
    dt = bench_chain(run, h0, T, seed=20)
    print(json.dumps({"probe": f"combined_{prec_name}",
                      "ms": round(dt * 1e3, 2),
                      "msamp_s": round(C * T / dt / 1e6, 1)}), flush=True)


def probe_base256():
    from pothoscomms_tpu.parallel.chain import fir_fft_chain

    rng = np.random.default_rng(5)
    taps = (rng.normal(size=K) + 1j * rng.normal(size=K)) / K
    t = 262144
    run, h0 = fir_fft_chain(taps, NBINS, C, t)
    dt = bench_chain(lambda x, c: run(x, c), h0, t, seed=21, iters=4)
    print(json.dumps({"probe": "base_T262k", "ms": round(dt * 1e3, 2),
                      "msamp_s": round(C * t / dt / 1e6, 1)}), flush=True)


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    which = sys.argv[1:] or ["hbm", "fft", "fir", "comb", "combh", "base256"]
    for w in which:
        {"hbm": probe_hbm, "fft": probe_fft, "fir": probe_fir,
         "comb": lambda: probe_comb("HIGHEST"),
         "combh": lambda: probe_comb("HIGH"),
         "base256": probe_base256}[w]()


if __name__ == "__main__":
    main()
