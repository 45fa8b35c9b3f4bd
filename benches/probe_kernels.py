"""Probe the product's jnp kernels on the axon TPU backend (no x64).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benches/probe_kernels.py [names]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def t(name, fn):
    t0 = time.perf_counter()
    try:
        r = fn()
        np.asarray(r[0] if isinstance(r, tuple) else r)
        print(f"{name} OK ({time.perf_counter() - t0:.1f}s)", flush=True)
    except Exception as e:
        print(f"{name} FAIL: {str(e)[:140]}", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    which = set(sys.argv[1:] or
                ["basic", "poly", "scan", "search", "hamming"])

    if "basic" in which:
        t("cumsum_f32", lambda: jnp.cumsum(jnp.ones(64, jnp.float32)))

    if "poly" in which:
        from pothoscomms_tpu.ops.filter import polyphase_fir
        xh = jnp.asarray(rng.normal(size=(515,)).astype(np.float32))
        tq = jnp.asarray(rng.normal(size=(1, 4)).astype(np.float32))
        t("polyphase_float", lambda: polyphase_fir(xh, tq, 1, 1, 4,
                                                   "float", 0))
        xh2 = jnp.asarray(rng.normal(size=(515, 2)).astype(np.float32))
        tq2 = jnp.asarray(rng.normal(size=(3, 4, 2)).astype(np.float32))
        t("polyphase_planar", lambda: polyphase_fir(xh2, tq2, 2, 3, 4,
                                                    "planar", 0))

    if "scan" in which:
        t("scan_f32", lambda: jax.lax.scan(
            lambda c, x: (c + x, c), jnp.float32(0),
            jnp.arange(8, dtype=jnp.float32))[1])
        from pothoscomms_tpu.ops.filter import envelope_scan
        xa = jnp.abs(jnp.asarray(rng.normal(size=256).astype(np.float32)))
        t("envelope_scan", lambda: envelope_scan(
            xa, jnp.float32(0), jnp.float32(0.9), jnp.float32(0.99)))

    if "search" in which:
        from pothoscomms_tpu.ops.framing import sync_search_planar
        from pothoscomms_tpu.parallel import cplx
        x = rng.normal(size=(1024,)) + 1j * rng.normal(size=(1024,))
        xp = jnp.asarray(cplx.to_planar(x))
        pre = jnp.asarray(cplx.to_planar(np.array([1.0 + 0j])))
        t("sync_search", lambda: sync_search_planar(
            xp, pre, 0.01, 80, 80, 4, 1, 1024 - 312 + 1))

    if "hamming" in which:
        from pothoscomms_tpu.ops.framing import (_bitplane_weights,
                                                 hamming_profile)
        w, b = _bitplane_weights(np.array([1, 0, 1, 1], np.uint8))
        xs = jnp.asarray(rng.integers(0, 2, 256).astype(np.float32))
        t("hamming_profile", lambda: hamming_profile(
            xs, jnp.asarray(w), b, 4, 8, 253))


if __name__ == "__main__":
    main()
