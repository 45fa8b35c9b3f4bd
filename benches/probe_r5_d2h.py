"""Round-5 probe: D2H fetch cost structure on the axon relay.

Is the 0.13 s fetch of 4 MB a fixed latency or a bandwidth wall?
Tries sizes 4/16/64 MB and three APIs: np.asarray, jax.device_get,
copy_to_host_async (pipelined overlap of two fetches).
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    res = {}
    for logn in (20, 22, 24):
        n = 1 << logn
        x = jnp.arange(n, dtype=jnp.float32) * np.float32(1.0000001)
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        a = np.asarray(x)
        dt = time.perf_counter() - t0
        res[f"asarray_{n*4>>20}mb_s"] = round(dt, 4)
        res[f"asarray_{n*4>>20}mb_mbps"] = round(n * 4 / dt / 1e6, 1)

    # device_get
    n = 1 << 22
    x = jnp.arange(n, dtype=jnp.float32) * np.float32(1.0000001)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    a = jax.device_get(x)
    res["device_get_16mb_s"] = round(time.perf_counter() - t0, 4)

    # async copy overlap: start two fetches, then wait both
    xs = []
    for i in range(4):
        z = jnp.arange(n, dtype=jnp.float32) * np.float32(1.0 + i)
        jax.block_until_ready(z)
        xs.append(z)
    t0 = time.perf_counter()
    for z in xs:
        try:
            z.copy_to_host_async()
        except Exception as e:
            res["copy_async_err"] = str(e)[:80]
            break
    outs = [np.asarray(z) for z in xs]
    dt = time.perf_counter() - t0
    res["async4x16mb_s"] = round(dt, 4)
    res["async4x16mb_mbps"] = round(4 * n * 4 / dt / 1e6, 1)

    # chunked fetch of one 16MB array in 4 pieces with async prefetch
    import jax.lax as lax
    parts = [jax.jit(lambda a, i=i: lax.slice_in_dim(
        a, i * (n // 4), (i + 1) * (n // 4)))(x) for i in range(4)]
    for p in parts:
        jax.block_until_ready(p)
    t0 = time.perf_counter()
    for p in parts:
        try:
            p.copy_to_host_async()
        except Exception:
            pass
    outs = [np.asarray(p) for p in parts]
    res["chunk4_16mb_s"] = round(time.perf_counter() - t0, 4)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
