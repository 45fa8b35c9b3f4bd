"""TPU probe round 7: combined-operator chain refinements at T=131072.

  combh     — combined FIR*DFT, HIGH, 4-matmul complex multiply
  combhk    — combined, HIGH, Karatsuba 3-matmul complex multiply
  combdk    — combined, DEFAULT, Karatsuba (speed reading; numerics
              likely outside the 0.01 contract — checked on CPU)
  sepk      — separate square-Toeplitz FIR + fft_planar, Karatsuba HIGH

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benches/probe_tpu7.py [names]
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from benches.probe_tpu6 import combined_operators

C, T, K, NBINS = 256, 131072, 64, 1024
REPS = 5
PREV_PAD = 128


def make_combined(prec, karatsuba: bool):
    (g0r, g0i), (g1r, g1i), taps = combined_operators(7, NBINS, K, PREV_PAD)
    g0s = g0r + g0i
    g1s = g1r + g1i
    k = K

    @jax.jit
    def run_impl(x, hist, g0r, g0i, g0s, g1r, g1i, g1s):
        c, t, _ = x.shape
        nw = t // NBINS
        xw = x.reshape(c, nw, NBINS, 2)
        first = jnp.concatenate(
            [jnp.zeros((c, 1, PREV_PAD - (k - 1), 2), x.dtype),
             hist[:, None]], axis=2)
        prev = jnp.concatenate(
            [first, xw[:, :-1, NBINS - PREV_PAD:, :]], axis=1)
        mm = lambda a, w: jnp.matmul(a, w, preferred_element_type=jnp.float32,
                                     precision=prec)

        def cmm4(a, wr, wi, ws):
            ar, ai = a[..., 0], a[..., 1]
            return (mm(ar, wr) - mm(ai, wi), mm(ar, wi) + mm(ai, wr))

        def cmm3(a, wr, wi, ws):
            ar, ai = a[..., 0], a[..., 1]
            p1 = mm(ar, wr)
            p2 = mm(ai, wi)
            p3 = mm(ar + ai, ws)
            return (p1 - p2, p3 - p1 - p2)

        cmm = cmm3 if karatsuba else cmm4
        yr0, yi0 = cmm(xw, g0r, g0i, g0s)
        yr1, yi1 = cmm(prev, g1r, g1i, g1s)
        spec = jnp.stack([yr0 + yr1, yi0 + yi1], axis=-1)
        return spec, x[:, t - (k - 1):, :]

    def run(x, hist):
        return run_impl(x, hist, g0r, g0i, g0s, g1r, g1i, g1s)

    return run, jnp.zeros((C, K - 1, 2), jnp.float32), taps


def make_separate_karatsuba(prec):
    from pothoscomms_tpu.parallel.fft import dft_matrices, _twiddles

    rng = np.random.default_rng(7)
    taps = (rng.normal(size=K) + 1j * rng.normal(size=K)) / K
    from pothoscomms_tpu.parallel.chain import fir_toeplitz_matrices

    t0, t1 = fir_toeplitz_matrices(taps)  # [128,128,2] each
    n1 = NBINS // 128
    f1r, f1i = dft_matrices(n1, False)
    f2r, f2i = dft_matrices(128, False)
    twr, twi = _twiddles(n1, 128, False)
    tw = jnp.asarray(np.stack([twr, twi], -1))

    def cmm3(a, wr, wi, prec=prec):
        ws = wr + wi
        mm = lambda p, q: jnp.matmul(p, q, preferred_element_type=jnp.float32,
                                     precision=prec)
        ar, ai = a[..., 0], a[..., 1]
        p1 = mm(ar, wr)
        p2 = mm(ai, wi)
        p3 = mm(ar + ai, ws)
        return jnp.stack([p1 - p2, p3 - p1 - p2], axis=-1)

    @jax.jit
    def run_impl(x, hist, t0, t1):
        c, t, _ = x.shape
        B = 128
        nb = t // B
        xb = x.reshape(c, nb, B, 2)
        k1 = K - 1
        prev_tail = jnp.concatenate(
            [jnp.zeros((c, B - k1, 2), x.dtype), hist], axis=1)
        prev = jnp.concatenate([prev_tail[:, None], xb[:, :-1]], axis=1)
        y = cmm3(xb, t0[..., 0], t0[..., 1]) + cmm3(prev, t1[..., 0],
                                                    t1[..., 1])
        y = y.reshape(c * (t // NBINS), NBINS, 2)
        # FFT: two-factor with karatsuba matmuls
        b = y.shape[0]
        xr2 = y.reshape(b, n1, 128, 2)
        xt = jnp.swapaxes(xr2, 1, 2)
        a = cmm3(xt, jnp.asarray(f1r), jnp.asarray(f1i))
        a = jnp.swapaxes(a, 1, 2)
        ar, ai = a[..., 0], a[..., 1]
        br = ar * tw[None, ..., 0] - ai * tw[None, ..., 1]
        bi = ar * tw[None, ..., 1] + ai * tw[None, ..., 0]
        a2 = jnp.stack([br, bi], -1)
        yq = cmm3(a2, jnp.asarray(f2r), jnp.asarray(f2i))
        spec = jnp.swapaxes(yq, 1, 2).reshape(b, NBINS, 2)
        return (spec.reshape(c, t // NBINS, NBINS, 2),
                x[:, t - k1:, :])

    def run(x, hist):
        return run_impl(x, hist, t0, t1)

    return run, jnp.zeros((C, K - 1, 2), jnp.float32), taps


def bench(run, carry0, seed, iters=REPS):
    rng = np.random.default_rng(seed)
    pool = []
    for _ in range(iters):
        x = jnp.asarray(rng.normal(size=(C, T, 2)).astype(np.float32) * 0.05)
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


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    P = jax.lax.Precision
    which = sys.argv[1:] or ["combh", "combhk", "combdk", "sepk"]
    makers = {
        "combh": lambda: make_combined(P.HIGH, False),
        "combhk": lambda: make_combined(P.HIGH, True),
        "combdk": lambda: make_combined(P.DEFAULT, True),
        "sepk": lambda: make_separate_karatsuba(P.HIGH),
    }
    for name in which:
        try:
            run, h0, _ = makers[name]()
            dt = bench(run, h0, seed=hash(name) % 100)
            print(json.dumps({"probe": name, "ms": round(dt * 1e3, 2),
                              "msamp_s": round(C * T / dt / 1e6, 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"probe": name, "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
