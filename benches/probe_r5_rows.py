"""Round-5 probe: does row count (sublane utilization) explain the
[1, 32Mi] fused-chain slowness vs the [256, *] compiler path?

Times the freq_demod and dc_removal device cores on the SAME 32 Mi
samples in shapes [1, 32Mi], [8, 4Mi], [64, 512Ki], [256, 128Ki], and
the envelope core likewise.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from pothoscomms_tpu.core.registry import BlockRegistry
import pothoscomms_tpu.blocks  # noqa: F401


def timed(fn, pool, n=3):
    out = fn(*pool[-1])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*pool[i % len(pool)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    T = 1 << 25
    rng = np.random.default_rng(0)
    res = {"T": T}
    shapes = [(1, T), (8, T // 8), (64, T // 64), (256, T // 256)]

    base_c = rng.normal(size=(T, 2)).astype(np.float32)
    base_r = rng.normal(size=T).astype(np.float32)

    demod = BlockRegistry.make("/comms/freq_demod", "complex_float32")
    dc = BlockRegistry.make("/comms/dc_removal", "float32")
    dc.set_average_size(32)
    dc.set_cascade_size(2)
    env = BlockRegistry.make("/comms/envelope_detector", "float32")
    env.set_attack(4.0)
    env.set_release(16.0)

    for C, L in shapes:
        key = f"{C}x{L >> 10}k"
        carry, dstep = demod.device_core(C)
        jd = jax.jit(dstep)
        x = jnp.asarray(base_c.reshape(C, L, 2))
        jax.block_until_ready(x)
        res[f"demod_{key}_ms"] = round(timed(jd, [(carry, x)]) * 1e3, 1)

        ccarry, cstep = dc.device_core(C)
        jc = jax.jit(cstep)
        xr = jnp.asarray(base_r.reshape(C, L))
        jax.block_until_ready(xr)
        res[f"dc_{key}_ms"] = round(timed(jc, [(ccarry, xr)]) * 1e3, 1)

        try:
            ecarry, estep = env.device_core(C)
            je = jax.jit(estep)
            res[f"env_{key}_ms"] = round(timed(je, [(ecarry, xr)]) * 1e3, 1)
        except Exception as e:
            res[f"env_{key}_err"] = str(e)[-90:]
        print(key, "done", flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
