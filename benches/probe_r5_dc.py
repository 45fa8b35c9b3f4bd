"""Real warm cost of the dc_removal core at [1, 32Mi] (proper pool +
forced-value discipline), vs a row-folded blocked-cumsum variant."""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from pothoscomms_tpu.core.registry import BlockRegistry
import pothoscomms_tpu.blocks  # noqa: F401


def timed(fn, pools, n=4):
    out = fn(*pools[-1])
    jax.tree_util.tree_map(
        lambda a: float(jnp.sum(a)) if hasattr(a, "shape") else a, out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*pools[i % len(pools)])
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))
    return (time.perf_counter() - t0) / n


def blocked_cumsum(x, R):
    """cumsum along axis 1 via [R, L] rows + exclusive row offsets."""
    C, T = x.shape
    xr = x.reshape(C, R, T // R)
    rc = jnp.cumsum(xr, axis=2)
    tot = rc[:, :, -1]
    off = jnp.cumsum(tot, axis=1) - tot
    return (rc + off[:, :, None]).reshape(C, T)


def main():
    T = 1 << 25
    rng = np.random.default_rng(0)
    res = {"T": T}
    dc = BlockRegistry.make("/comms/dc_removal", "float32")
    dc.set_average_size(32)
    dc.set_cascade_size(2)
    carry, step = dc.device_core(1)
    j = jax.jit(step)
    pools = []
    for i in range(4):
        x = jnp.asarray(rng.normal(size=(1, T)).astype(np.float32))
        float(jnp.sum(x))
        pools.append((carry, x))
    res["dc_current_ms"] = round(timed(j, pools) * 1e3, 1)
    print("current done", flush=True)

    # row-folded variant: same math, cumsums run as [R, L] rows
    d, casc = 32, 2

    def step_folded(carry, x, R=512):
        cur = x
        hists = []
        delayed = None
        for s in range(casc):
            ext = jnp.concatenate([carry[s], cur], axis=1)
            n = ext.shape[1] - d
            pad = (-ext.shape[1]) % R
            extp = jnp.pad(ext, ((0, 0), (0, pad)))
            csum = blocked_cumsum(extp, R)[:, :ext.shape[1]]
            avg = (csum[:, d:] - csum[:, :n]) / d
            hists.append(ext[:, -d:])
            if s == 0:
                delayed = jax.lax.dynamic_slice_in_dim(
                    ext, 1, x.shape[1], axis=1)
            cur = avg
        return jnp.stack(hists), delayed - cur

    jf = jax.jit(step_folded)
    res["dc_folded_ms"] = round(timed(jf, pools) * 1e3, 1)
    y0 = j(*pools[0])[1]
    y1 = jf(*pools[0])[1]
    res["maxerr"] = float(jnp.max(jnp.abs(y0 - y1)))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
