"""Pallas streaming ceiling on this relay: a trivial scale-by-2 kernel
at the bench shape [32768, 1024] f32 planes, various row-tile sizes.
If Pallas can't stream near the 60 GB/s XLA elementwise roof
(probe_r4_perf.py), a fused one-pass FIR+FFT kernel cannot win
regardless of its FLOP savings.
"""
import json
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _scale_kernel(xr_ref, xi_ref, yr_ref, yi_ref):
    yr_ref[:] = xr_ref[:] * 2.0
    yi_ref[:] = xi_ref[:] * 2.0


@partial(jax.jit, static_argnames=("tb",))
def scale_pallas(xr, xi, tb: int):
    B, N = xr.shape
    return pl.pallas_call(
        _scale_kernel,
        grid=(B // tb,),
        in_specs=[
            pl.BlockSpec((tb, N), lambda i: (i, i * 0)),
            pl.BlockSpec((tb, N), lambda i: (i, i * 0)),
        ],
        out_specs=(
            pl.BlockSpec((tb, N), lambda i: (i, i * 0)),
            pl.BlockSpec((tb, N), lambda i: (i, i * 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N), jnp.float32),
            jax.ShapeDtypeStruct((B, N), jnp.float32),
        ),
    )(xr, xi)


def main():
    rng = np.random.default_rng(0)
    B, N = 32768, 1024
    res = {}
    pool = []
    for _ in range(4):
        xr = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))
        xi = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))
        float(jnp.sum(xr))
        pool.append((xr, xi))
    nbytes = 2 * 2 * B * N * 4  # in+out, two planes
    # VMEM budget: (2 in + 2 out planes) x tb x 1024 x 4 B, double-
    # buffered by the pipeline -> tb=512 is 16 MB (the cap); stay below
    for tb in (128, 256, 512):
        yr, yi = scale_pallas(*pool[-1], tb)
        float(jnp.sum(yr))
        t0 = time.perf_counter()
        for i in range(3):
            yr, yi = scale_pallas(*pool[i], tb)
        float(jnp.sum(yr))
        dt = (time.perf_counter() - t0) / 3
        res[f"tb{tb}_ms"] = round(dt * 1e3, 2)
        res[f"tb{tb}_GBs"] = round(nbytes / dt / 1e9, 1)
    res["device"] = jax.devices()[0].device_kind
    print(json.dumps(res))


if __name__ == "__main__":
    main()
