"""A/B: merged-operator operand built via conv_general_dilated_patches
(overlapping [pp+nbins] windows straight from the padded stream) vs the
three-concat construction in fir_fft_combined_step.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


def timeit(fn, pool):
    out = fn(*pool[-1])
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for i in range(len(pool) - 1):
        out = fn(*pool[i])
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / (len(pool) - 1)


def main():
    from pothoscomms_tpu.parallel.chain import combined_fir_fft_operators

    C, T, K, NBINS, PP = 256, 131072, 64, 1024, 128
    rng = np.random.default_rng(0)
    taps = (rng.normal(size=K) + 1j * rng.normal(size=K)) / K
    (g0r, g0i), (g1r, g1i) = combined_fir_fft_operators(taps, NBINS, PP)
    g01r = jnp.concatenate([g1r, g0r], axis=0)
    g01i = jnp.concatenate([g1i, g0i], axis=0)
    g01s = g01r + g01i
    samples = C * T
    res = {}

    mm = lambda p, w: jnp.matmul(p, w, preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGH)

    @jax.jit
    def concat_form(x, hist):
        c, t, _ = x.shape
        nw = t // NBINS
        xw = x.reshape(c, nw, NBINS, 2)
        first = jnp.concatenate(
            [jnp.zeros((c, 1, PP - (K - 1), 2), x.dtype), hist[:, None]],
            axis=2)
        prev = jnp.concatenate([first, xw[:, :-1, NBINS - PP:, :]], axis=1)
        a = jnp.concatenate([prev, xw], axis=2)
        ar, ai = a[..., 0], a[..., 1]
        p1 = mm(ar, g01r)
        p2 = mm(ai, g01i)
        p3 = mm(ar + ai, g01s)
        return jnp.stack([p1 - p2, p3 - p1 - p2], axis=-1)

    @jax.jit
    def patches_form(x, hist):
        c, t, _ = x.shape
        nw = t // NBINS
        # padded stream: [c, pp + t, 2]; window w = xe[w*NBINS : w*NBINS
        # + pp + NBINS] — overlapping patches with stride NBINS
        pad = jnp.concatenate(
            [jnp.zeros((c, PP - (K - 1), 2), x.dtype), hist], axis=1)
        xe = jnp.concatenate([pad, x], axis=1)
        W = PP + NBINS

        def plane(z):  # [c, pp+t] -> [c, nw, W]
            p = jax.lax.conv_general_dilated_patches(
                z[:, None, :], (W,), (NBINS,), "VALID",
                dimension_numbers=("NCW", "OIW", "NCW"))
            # [c, W, nw] -> [c, nw, W]
            return jnp.moveaxis(p, 1, 2)

        ar = plane(xe[..., 0])
        ai = plane(xe[..., 1])
        p1 = mm(ar, g01r)
        p2 = mm(ai, g01i)
        p3 = mm(ar + ai, g01s)
        return jnp.stack([p1 - p2, p3 - p1 - p2], axis=-1)

    pool = []
    for _ in range(5):
        x = jnp.asarray(rng.normal(size=(C, T, 2)).astype(np.float32))
        float(jnp.sum(x))
        pool.append((x, jnp.zeros((C, K - 1, 2), jnp.float32)))

    dt = timeit(concat_form, pool)
    res["concat_ms"] = round(dt * 1e3, 2)
    res["concat_msamp_s"] = round(samples / dt / 1e6, 1)
    try:
        a = concat_form(*pool[0])
        b = patches_form(*pool[0])
        res["max_diff"] = float(jnp.max(jnp.abs(a - b)))
        dt = timeit(patches_form, pool)
        res["patches_ms"] = round(dt * 1e3, 2)
        res["patches_msamp_s"] = round(samples / dt / 1e6, 1)
    except Exception as e:
        res["patches_err"] = str(e)[-150:]
    print(json.dumps(res))


if __name__ == "__main__":
    main()
