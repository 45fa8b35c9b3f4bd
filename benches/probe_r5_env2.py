"""Decompose the envelope cost at [1, 32Mi]: (a) the xfull[:, idx]
GATHER window build (suspect: scalar gathers lane-pad x128 on this
backend), (b) the scan alone on a prebuilt xt, (c) a gather-free
shifted-slice window build (W rounded to a multiple of L).
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, pool, n=3):
    out = fn(*pool[-1])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*pool[i % len(pool)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


T = 1 << 25
W = 280
ga, gr = jnp.float32(0.9), jnp.float32(0.99)


def build_gather(mag, carry, L):
    P = mag.shape[0]
    nb = T // L
    xfull = jnp.concatenate(
        [jnp.broadcast_to(carry[:, None], (P, W)), mag], axis=1)
    idx = (jnp.arange(nb, dtype=jnp.int32)[:, None] * L
           + jnp.arange(W + L, dtype=jnp.int32)[None, :])
    xb = xfull[:, idx]
    return jnp.moveaxis(xb, 2, 0)


def build_slices(mag, carry, L, Wr):
    """Gather-free: xt[k*L+l, p, j] = rows[p, j+k, l] with rows a plain
    reshape and k over Wr/L + 1 shifted row views."""
    P = mag.shape[0]
    nb = T // L
    K = Wr // L
    xfull = jnp.concatenate(
        [jnp.broadcast_to(carry[:, None], (P, Wr)), mag], axis=1)
    rows = xfull.reshape(P, nb + K, L)
    wins = jnp.stack([rows[:, k:k + nb] for k in range(K + 1)], axis=0)
    # [K+1, P, nb, L] -> [K+1, L, P, nb] -> [(K+1)*L, P, nb]
    xt = jnp.transpose(wins, (0, 3, 1, 2)).reshape((K + 1) * L, P, nb)
    return xt


def scan_only(xt):
    def body(env, xn):
        g = jnp.where(xn > env, ga, gr)
        env = g * env + (1.0 - g) * xn
        return env, env

    env_f, ys = jax.lax.scan(body, xt[0], xt)
    return env_f, ys


def main():
    rng = np.random.default_rng(0)
    res = {}
    pool = []
    for i in range(3):
        x = jnp.asarray(np.abs(rng.normal(size=(1, T))).astype(np.float32))
        jax.block_until_ready(x)
        pool.append((x, jnp.zeros((1,), jnp.float32)))

    for L in (8192, 2048):
        fb = jax.jit(lambda m, c, L=L: build_gather(m, c, L))
        res[f"gather_L{L}_ms"] = round(timed(fb, pool) * 1e3, 1)
        xt = fb(*pool[0])
        jax.block_until_ready(xt)
        fs = jax.jit(scan_only)
        xt_pool = [(xt,)]
        res[f"scan_L{L}_steps"] = int(xt.shape[0])
        res[f"scan_L{L}_ms"] = round(timed(fs, xt_pool) * 1e3, 1)
        print("L", L, "done", flush=True)

    for L, Wr in ((256, 512), (512, 512), (1024, 1024)):
        fb2 = jax.jit(lambda m, c, L=L, Wr=Wr: build_slices(m, c, L, Wr))
        res[f"slices_L{L}_W{Wr}_ms"] = round(timed(fb2, pool) * 1e3, 1)
        xt2 = fb2(*pool[0])
        jax.block_until_ready(xt2)
        fs = jax.jit(scan_only)
        res[f"scanS_L{L}_steps"] = int(xt2.shape[0])
        res[f"scanS_L{L}_ms"] = round(timed(fs, [(xt2,)]) * 1e3, 1)
        print("slices L", L, "done", flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
