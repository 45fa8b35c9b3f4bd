"""Phase probe: where does the source-headed FM chain's time go?

Times each fused core in isolation at the [1, 32Mi] quantum shape the
block-API segment actually runs (pool + forced fetch discipline).
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from pothoscomms_tpu.core.registry import BlockRegistry
import pothoscomms_tpu.blocks  # noqa: F401


def timed(fn, pool, n=3):
    import sys
    out = fn(*pool[-1])
    jax.tree_util.tree_map(
        lambda a: float(jnp.sum(a)) if hasattr(a, "shape") else a, out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*pool[i])
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))
    return (time.perf_counter() - t0) / n


def main():
    T = 1 << 25  # one 32Mi fused quantum
    rng = np.random.default_rng(0)
    res = {"T": T}

    # 1. noise source generation core
    src = BlockRegistry.make("/comms/noise_source", "complex_float32", 1)
    src._active = True
    src._update_table()
    carry, sstep, sparams = src.fuse_source_export(1)
    jst = jax.jit(lambda c: sstep(c, T, *sparams))
    pool = [(jnp.asarray(np.float32(i * 7.0)),) for i in range(4)]
    try:
        res["noise_ms"] = round(timed(jst, pool) * 1e3, 1)
    except Exception as e:
        res["noise_err"] = str(e)[-120:]
    print("noise done", res, flush=True)

    # 2-4. demod, dc, envelope cores on [1, T] planar
    demod = BlockRegistry.make("/comms/freq_demod", "complex_float32")
    dcarry, dstep = demod.device_core(1)
    jd = jax.jit(dstep)
    pool = []
    for i in range(4):
        x = jnp.asarray(rng.normal(size=(1, T, 2)).astype(np.float32))
        float(jnp.sum(x))
        pool.append((dcarry, x))
    try:
        res["demod_ms"] = round(timed(jd, pool) * 1e3, 1)
    except Exception as e:
        res["demod_err"] = str(e)[-120:]
    print("demod done", flush=True)

    dc = BlockRegistry.make("/comms/dc_removal", "float32")
    dc.set_average_size(32)
    dc.set_cascade_size(2)
    ccarry, cstep = dc.device_core(1)
    jc = jax.jit(cstep)
    poolr = []
    for i in range(4):
        x = jnp.asarray(rng.normal(size=(1, T)).astype(np.float32))
        float(jnp.sum(x))
        poolr.append((ccarry, x))
    try:
        res["dc_ms"] = round(timed(jc, poolr) * 1e3, 1)
    except Exception as e:
        res["dc_err"] = str(e)[-120:]
    print("dc done", flush=True)

    env = BlockRegistry.make("/comms/envelope_detector", "float32")
    env.set_attack(4.0)
    env.set_release(16.0)
    ecarry, estep = env.device_core(1)
    je = jax.jit(estep)
    try:
        res["env_ms"] = round(timed(je, poolr) * 1e3, 1)
    except Exception as e:
        res["env_err"] = str(e)[-120:]
    print("env done", flush=True)

    total = sum(v for k, v in res.items() if k.endswith("_ms"))
    if total:
        res["sum_ms"] = round(total, 1)
        res["sum_msamp_s"] = round(T / total / 1e3, 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
