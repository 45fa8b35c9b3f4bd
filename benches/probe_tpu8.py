"""TPU probe round 8: final bench-config selection.

  combhk262 — combined Karatsuba HIGH at T=262144
  fusedhk   — single [.,1152]@[1152,1024] Karatsuba HIGH (prev folded in)
  numerics  — on-chip max-abs error of HIGH-k and DEFAULT-k vs HIGHEST
              on unit-scale signals (the kissfft 0.01-abs contract scale)

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benches/probe_tpu8.py [names]
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import benches.probe_tpu7 as p7
from benches.probe_tpu6 import combined_operators

C, K, NBINS = 256, 64, 1024
PREV_PAD = 128


def make_fused(prec):
    (g0r, g0i), (g1r, g1i), taps = combined_operators(7, NBINS, K, PREV_PAD)
    gr = jnp.concatenate([g1r, g0r], axis=0)   # [1152, 1024]
    gi = jnp.concatenate([g1i, g0i], axis=0)
    gs = gr + gi
    k = K

    @jax.jit
    def run_impl(x, hist, gr, gi, gs):
        c, t, _ = x.shape
        nw = t // NBINS
        xw = x.reshape(c, nw, NBINS, 2)
        first = jnp.concatenate(
            [jnp.zeros((c, 1, PREV_PAD - (k - 1), 2), x.dtype),
             hist[:, None]], axis=2)
        prev = jnp.concatenate(
            [first, xw[:, :-1, NBINS - PREV_PAD:, :]], axis=1)
        ext = jnp.concatenate([prev, xw], axis=2)      # [c, nw, 1152, 2]
        mm = lambda a, w: jnp.matmul(a, w, preferred_element_type=jnp.float32,
                                     precision=prec)
        ar, ai = ext[..., 0], ext[..., 1]
        p1 = mm(ar, gr)
        p2 = mm(ai, gi)
        p3 = mm(ar + ai, gs)
        spec = jnp.stack([p1 - p2, p3 - p1 - p2], axis=-1)
        return spec, x[:, t - (k - 1):, :]

    def run(x, hist):
        return run_impl(x, hist, gr, gi, gs)

    return run, jnp.zeros((C, K - 1, 2), jnp.float32), taps


def bench(run, carry0, t, seed, iters=4):
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


def probe_combhk262():
    p7.T = 262144
    run, h0, _ = p7.make_combined(jax.lax.Precision.HIGH, True)
    dt = bench(run, h0, 262144, seed=30)
    print(json.dumps({"probe": "combhk_T262k", "ms": round(dt * 1e3, 2),
                      "msamp_s": round(C * 262144 / dt / 1e6, 1)}),
          flush=True)


def probe_fusedhk():
    run, h0, _ = make_fused(jax.lax.Precision.HIGH)
    t = 131072
    dt = bench(run, h0, t, seed=31)
    print(json.dumps({"probe": "fusedhk_T131k", "ms": round(dt * 1e3, 2),
                      "msamp_s": round(C * t / dt / 1e6, 1)}), flush=True)


def probe_numerics():
    """Unit-scale signals (kissfft contract scale): err vs HIGHEST."""
    p7.C, p7.T = 8, 8192
    P = jax.lax.Precision
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.normal(size=(8, 8192, 2)).astype(np.float32))
    outs = {}
    for name, mk in [("HIGHEST_k", lambda: p7.make_combined(P.HIGHEST, True)),
                     ("HIGH_k", lambda: p7.make_combined(P.HIGH, True)),
                     ("DEFAULT_k", lambda: p7.make_combined(P.DEFAULT, True))]:
        run, h0, _ = mk()
        h0 = h0[:8]
        spec, _ = run(x, h0)
        outs[name] = np.asarray(spec)
    ref = outs["HIGHEST_k"]
    scale = float(np.max(np.abs(ref)))
    for name in ("HIGH_k", "DEFAULT_k"):
        err = float(np.max(np.abs(outs[name] - ref)))
        print(json.dumps({"probe": f"numerics_{name}",
                          "max_abs_err": round(err, 5),
                          "spectra_scale": round(scale, 2),
                          "within_0p01": err < 0.01}), flush=True)
    p7.C, p7.T = 256, 131072


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    which = sys.argv[1:] or ["numerics", "fusedhk", "combhk262"]
    for w in which:
        {"combhk262": probe_combhk262, "fusedhk": probe_fusedhk,
         "numerics": probe_numerics}[w]()


if __name__ == "__main__":
    main()
