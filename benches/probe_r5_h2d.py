"""Round-5 probe: is H2D ingest on this relay async/overlappable?

Measures (a) plain jnp.asarray upload cost of a 256 MB host buffer,
(b) jax.device_put dispatch time vs completion time, (c) whether a
device_put issued BEFORE a compute call hides under it (double-buffered
pipeline), vs the serial upload->compute->force pattern the fft_64ch
bench currently runs.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def force(x):
    return float(jnp.sum(x))


def main():
    C, NB, F = 64, 1024, 32
    shape = (C * F, NB, 2)
    nbytes = int(np.prod(shape)) * 4
    rng = np.random.default_rng(0)
    hosts = [rng.normal(size=shape).astype(np.float32) for _ in range(6)]
    res = {"mb": nbytes / 1e6}

    # (a) serial upload + force
    x = jnp.asarray(hosts[0]); force(x)
    t0 = time.perf_counter()
    for h in hosts[1:4]:
        x = jnp.asarray(h)
        force(x)
    res["upload_force_s"] = round((time.perf_counter() - t0) / 3, 4)

    # (b) device_put dispatch vs completion
    t0 = time.perf_counter()
    y = jax.device_put(hosts[4])
    res["device_put_dispatch_s"] = round(time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    jax.block_until_ready(y)
    res["device_put_wait_s"] = round(time.perf_counter() - t0, 4)

    # (c) overlap: dispatch upload N+1, then compute on N, then force
    from pothoscomms_tpu.parallel.fft import fft_planar
    f = jax.jit(lambda z: fft_planar(z, NB, False))
    xs = [jnp.asarray(h) for h in hosts[:4]]
    for z in xs:
        jax.block_until_ready(z)
    out = f(xs[0]); force(out)  # compile

    # serial: upload i, compute i, force i
    t0 = time.perf_counter()
    for h in hosts[:4]:
        z = jnp.asarray(h)
        force(f(z))
    res["serial_per_iter_s"] = round((time.perf_counter() - t0) / 4, 4)

    # pipelined: upload i+1 before forcing i
    t0 = time.perf_counter()
    z = jax.device_put(hosts[0])
    prev = None
    for i in range(4):
        out = f(z)
        if i + 1 < 4:
            z = jax.device_put(hosts[i + 1])  # in flight during compute
        if prev is not None:
            force(prev)
        prev = out
    force(prev)
    res["pipelined_per_iter_s"] = round((time.perf_counter() - t0) / 4, 4)

    # compute-only floor (resident input, chained)
    t0 = time.perf_counter()
    z2 = xs[0]
    for _ in range(4):
        z2 = f(z2)
    jax.block_until_ready(z2)
    res["compute_only_per_iter_s"] = round((time.perf_counter() - t0) / 4, 4)

    samples = C * F * NB
    res["serial_msamp_s"] = round(samples / res["serial_per_iter_s"] / 1e6, 1)
    res["pipelined_msamp_s"] = round(
        samples / res["pipelined_per_iter_s"] / 1e6, 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
