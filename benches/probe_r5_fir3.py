"""Where do 570 ms of the fused [1, 2^20] waveform->FIR program go?
Times: source step alone, FIR step alone, composed program, at q=2^20,
plus the FIR step at [8, 2^17] (row-folded) for comparison.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from pothoscomms_tpu.core.registry import BlockRegistry
import pothoscomms_tpu.blocks  # noqa: F401


def timed(fn, pools, n=4):
    out = fn(*pools[-1])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*pools[i % len(pools)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    q = 1 << 20
    rng = np.random.default_rng(0)
    res = {"q": q}

    src = BlockRegistry.make("/comms/waveform_source", "float32")
    src.set_waveform("SINE")
    src.set_frequency(0.02)
    src.set_sample_rate(1.0)
    src._active = True
    src._update_table()
    carry, sstep, sparams = src.fuse_source_export(1)
    jsrc = jax.jit(lambda c: sstep(c, q, *sparams))
    pools = [(jnp.asarray(np.float32(i * 13.0)),) for i in range(4)]
    res["src_ms"] = round(timed(jsrc, pools) * 1e3, 1)
    print("src done", flush=True)

    fir = BlockRegistry.make("/comms/fir_filter", "float32")
    fir.set_taps(rng.normal(size=51) / 51.0)
    fcarry, fstep = fir.device_core(1)
    jfir = jax.jit(fstep)
    fpools = []
    for i in range(4):
        x = jnp.asarray(rng.normal(size=(1, q)).astype(np.float32))
        jax.block_until_ready(x)
        fpools.append((fcarry, x))
    res["fir_1row_ms"] = round(timed(jfir, fpools) * 1e3, 1)
    print("fir 1row done", flush=True)

    fcarry8, fstep8 = fir.device_core(8)
    jfir8 = jax.jit(fstep8)
    fpools8 = []
    for i in range(4):
        x = jnp.asarray(rng.normal(size=(8, q // 8)).astype(np.float32))
        jax.block_until_ready(x)
        fpools8.append((fcarry8, x))
    res["fir_8row_ms"] = round(timed(jfir8, fpools8) * 1e3, 1)
    print("fir 8row done", flush=True)

    # composed, as the fused segment runs it
    @jax.jit
    def composed(c0, cf, se):
        c0b, y = sstep(c0, q, se)
        cfb, z = fstep(cf, y[0][None])
        return c0b, cfb, z

    cpools = [(jnp.asarray(np.float32(i * 13.0)), fcarry, sparams[0])
              for i in range(4)]
    res["composed_ms"] = round(timed(composed, cpools) * 1e3, 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
