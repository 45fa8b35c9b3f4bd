"""Round-4 perf probe (VERDICT r3 next #1): where is the wall?

Measures, with the pool/forced-fetch discipline the relay demands:
  0. pure elementwise pass bandwidth at the bench shape (the IO roof:
     any chain formulation must read x once and write spec once)
  1. the production combined FIR*DFT operator (current BENCH number)
  2. merged single-matmul variant (G0|G1 concatenated -> one matmul)
  3. the circular-correction minimal-FLOP formulation (re-probe)
  4. circular-correction with the fused Pallas two-stage FFT kernel

If (0)'s duplex bandwidth matches (1)'s effective rate, the chain is at
the IO wall on this relay and FLOP reduction cannot help.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def pool_of(rng, n, shape):
    out = []
    for _ in range(n):
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        float(jnp.sum(x))
        out.append(x)
    return out


def timeit(fn, pool, *extra, iters=None):
    """fn(x, *extra) per pool entry; warmup on pool[-1]; forced fetch."""
    iters = iters or (len(pool) - 1)
    out = fn(pool[-1], *extra)
    f = out[0] if isinstance(out, tuple) else out
    float(jnp.sum(f))
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(pool[i], *extra)
    f = out[0] if isinstance(out, tuple) else out
    float(jnp.sum(f))
    return (time.perf_counter() - t0) / iters


def main():
    from pothoscomms_tpu.parallel.chain import (
        circ_correction_operators,
        combined_fir_fft_operators,
        fir_fft_chain,
        fir_fft_circ_step,
    )

    C, T, K, NBINS = 256, 131072, 64, 1024
    rng = np.random.default_rng(0)
    taps = (rng.normal(size=K) + 1j * rng.normal(size=K)) / K
    res = {}
    samples = C * T
    pool = pool_of(rng, 6, (C, T, 2))

    # 0. elementwise pass: duplex IO roof
    scale = jax.jit(lambda x: x * np.float32(1.0001))
    dt = timeit(scale, pool)
    res["elementwise_pass_ms"] = round(dt * 1e3, 2)
    res["duplex_GBs"] = round(2 * samples * 8 / dt / 1e9, 1)

    # 1. production combined operator
    run, carry = fir_fft_chain(taps, NBINS, C, T)
    dt = timeit(lambda x: run(x, carry), pool)
    res["combined_ms"] = round(dt * 1e3, 2)
    res["combined_msamp_s"] = round(samples / dt / 1e6, 1)

    # 2. merged single matmul: G01 [pp+nbins, nbins], operand concat
    pp = 128
    (g0r, g0i), (g1r, g1i) = combined_fir_fft_operators(taps, NBINS, pp)
    g01r = jnp.concatenate([g1r, g0r], axis=0)
    g01i = jnp.concatenate([g1i, g0i], axis=0)
    g01s = g01r + g01i
    k = K

    @jax.jit
    def merged(x, hist):
        c, t, _ = x.shape
        nw = t // NBINS
        xw = x.reshape(c, nw, NBINS, 2)
        first = jnp.concatenate(
            [jnp.zeros((c, 1, pp - (k - 1), 2), x.dtype), hist[:, None]],
            axis=2)
        prev = jnp.concatenate(
            [first, xw[:, :-1, NBINS - pp:, :]], axis=1)
        a = jnp.concatenate([prev, xw], axis=2)  # [c, nw, pp+nbins, 2]
        mm = lambda p, q: jnp.matmul(p, q, preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.HIGH)
        ar, ai = a[..., 0], a[..., 1]
        p1 = mm(ar, g01r)
        p2 = mm(ai, g01i)
        p3 = mm(ar + ai, g01s)
        return jnp.stack([p1 - p2, p3 - p1 - p2], axis=-1)

    hist0 = jnp.zeros((C, K - 1, 2), jnp.float32)
    dt = timeit(lambda x: merged(x, hist0), pool)
    res["merged_ms"] = round(dt * 1e3, 2)
    res["merged_msamp_s"] = round(samples / dt / 1e6, 1)

    # 3. circular-correction (minimal FLOPs), pool discipline
    Hp, (gcr, gci) = circ_correction_operators(taps, NBINS)
    gcs = gcr + gci

    dt = timeit(lambda x: fir_fft_circ_step(
        x, hist0, Hp, gcr, gci, gcs, NBINS, K), pool)
    res["circ_ms"] = round(dt * 1e3, 2)
    res["circ_msamp_s"] = round(samples / dt / 1e6, 1)

    # 4. circ-correction with the fused Pallas two-stage FFT
    from pothoscomms_tpu.parallel.pallas_kernels import fft_planar_fused

    @jax.jit
    def circ_pallas(x, hist):
        from pothoscomms_tpu.parallel import cplx

        c, t, _ = x.shape
        nw = t // NBINS
        xw = x.reshape(c, nw, NBINS, 2)
        spec = fft_planar_fused(xw.reshape(c * nw, NBINS, 2), NBINS, False)
        spec = cplx.mul(spec.reshape(c, nw, NBINS, 2), Hp[None, None])
        tails = xw[:, :, NBINS - (K - 1):, :][:, :, ::-1, :]
        prev_tails = jnp.concatenate(
            [hist[:, None, ::-1, :], tails[:, :-1]], axis=1)
        u = prev_tails - tails
        mm = lambda a, w: jnp.matmul(a, w, preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.HIGH)
        ur, ui = u[..., 0], u[..., 1]
        p1 = mm(ur, gcr)
        p2 = mm(ui, gci)
        p3 = mm(ur + ui, gcs)
        return spec + jnp.stack([p1 - p2, p3 - p1 - p2], axis=-1)

    try:
        dt = timeit(lambda x: circ_pallas(x, hist0), pool)
        res["circ_pallas_ms"] = round(dt * 1e3, 2)
        res["circ_pallas_msamp_s"] = round(samples / dt / 1e6, 1)
    except Exception as e:  # pallas may reject on this backend
        res["circ_pallas_error"] = str(e)[:200]

    res["device"] = jax.devices()[0].device_kind
    print(json.dumps(res))


if __name__ == "__main__":
    main()
