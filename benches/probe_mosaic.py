"""Which VMEM layout moves does Mosaic accept on this backend?

The fused FIR+FFT kernel needs one interleave between the two CT
stages; the round-1 kernel worked around a rejected (.., 128, 8) ->
(.., 1024) collapse with a 16x tile expansion that blew VMEM. Test the
candidate moves individually (compile + numeric check + timing)."""
import json
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def try_kernel(name, body, oracle, B=4096, N=1024, tb=256):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, N)).astype(np.float32)

    def kernel(x_ref, y_ref):
        y_ref[:] = body(x_ref[:])

    @jax.jit
    def run(xj):
        return pl.pallas_call(
            kernel,
            grid=(B // tb,),
            in_specs=[pl.BlockSpec((tb, N), lambda i: (i, i * 0))],
            out_specs=pl.BlockSpec((tb, N), lambda i: (i, i * 0)),
            out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        )(xj)

    try:
        xj = jnp.asarray(x)
        y = np.asarray(run(xj))
        ok = bool(np.allclose(y, oracle(x), atol=1e-6))
        t0 = time.perf_counter()
        for _ in range(3):
            y = run(xj)
        float(jnp.sum(y))
        dt = (time.perf_counter() - t0) / 3
        return {"ok": ok, "ms": round(dt * 1e3, 2)}
    except Exception as e:
        return {"error": str(e)[-160:]}


def main():
    res = {}
    tb, N = 256, 1024

    # A: split (8,128), swap, collapse (128,8)->1024  [minor-8 collapse]
    res["A_collapse_minor8"] = try_kernel(
        "A",
        lambda x: jnp.swapaxes(x.reshape(tb, 8, 128), 1, 2).reshape(tb, N),
        lambda x: np.swapaxes(x.reshape(-1, 8, 128), 1, 2).reshape(-1, N),
    )
    # B: split (128,8) [minor-8 expand], swap, collapse (8,128)->1024
    res["B_expand_minor8"] = try_kernel(
        "B",
        lambda x: jnp.swapaxes(x.reshape(tb, 128, 8), 1, 2).reshape(tb, N),
        lambda x: np.swapaxes(x.reshape(-1, 128, 8), 1, 2).reshape(-1, N),
    )
    # C: 3-factor (8,16,8) transpose (0,3,2,1) and collapse
    res["C_3factor"] = try_kernel(
        "C",
        lambda x: jnp.transpose(
            x.reshape(tb, 8, 16, 8), (0, 3, 2, 1)).reshape(tb, N),
        lambda x: np.transpose(
            x.reshape(-1, 8, 16, 8), (0, 3, 2, 1)).reshape(-1, N),
    )
    # D: strided lane slice x[:, 3::8] materialized into contiguous
    res["D_stride8_slice"] = try_kernel(
        "D",
        lambda x: jnp.concatenate([x[:, m::8] for m in range(8)], axis=1),
        lambda x: np.concatenate([x[:, m::8] for m in range(8)], axis=1),
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
