"""Round-5 probe: envelope follower variants at [1, 32Mi].

Current: BLK=8192 -> scan of W+8192 steps on [1, 4096] state = 819 ms.
Variants: smaller BLK (fewer steps, more rows), lax.scan unroll, state
folded to 2D tiles. Also the demod core with an internal row fold.
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


def env_variant(BLK, W, unroll, fold):
    ga, gr = jnp.float32(0.9), jnp.float32(0.99)

    def step(carry, mag):
        P, T = mag.shape
        nb = T // BLK
        xfull = jnp.concatenate(
            [jnp.broadcast_to(carry[:, None], (P, W)), mag], axis=1)
        idx = (jnp.arange(nb, dtype=jnp.int32)[:, None] * BLK
               + jnp.arange(W + BLK, dtype=jnp.int32)[None, :])
        xb = xfull[:, idx]
        xt = jnp.moveaxis(xb, 2, 0)  # [W+BLK, P, nb]
        if fold and nb % fold == 0:
            xt = xt.reshape(W + BLK, P * fold, nb // fold)
        e = xt[0]

        def body(env, xn):
            g = jnp.where(xn > env, ga, gr)
            env = g * env + (1.0 - g) * xn
            return env, env

        env_f, ys = jax.lax.scan(body, e, xt, unroll=unroll)
        if fold and nb % fold == 0:
            ys = ys.reshape(W + BLK, P, nb)
            env_f = env_f.reshape(P, nb)
        y = jnp.transpose(ys[W:], (1, 2, 0)).reshape(P, T)
        return env_f[:, -1], y

    return step

def main():
    T = 1 << 25
    W = 280
    rng = np.random.default_rng(0)
    res = {}
    pool = []
    for i in range(3):
        x = jnp.asarray(np.abs(rng.normal(size=(1, T))).astype(np.float32))
        jax.block_until_ready(x)
        pool.append((jnp.zeros((1,), jnp.float32), x))

    ref = None
    for blk, unroll, fold in ((8192, 1, 0), (8192, 8, 0), (2048, 8, 0),
                              (1024, 16, 0), (1024, 16, 8), (512, 32, 8),
                              (2048, 16, 8)):
        f = jax.jit(env_variant(blk, W, unroll, fold))
        try:
            dt = timed(f, pool)
            key = f"env_b{blk}_u{unroll}_f{fold}"
            res[key + "_ms"] = round(dt * 1e3, 1)
            y = f(*pool[0])[1]
            if ref is None:
                ref = np.asarray(y)
            else:
                res[key + "_maxerr"] = float(np.max(np.abs(
                    np.asarray(y) - ref)))
        except Exception as e:
            res[f"env_b{blk}_u{unroll}_f{fold}_err"] = str(e)[-90:]
        print(blk, unroll, fold, "done", flush=True)

    # demod with internal row fold
    from pothoscomms_tpu.parallel.chain import freq_demod_planar
    zpool = []
    for i in range(3):
        z = jnp.asarray(rng.normal(size=(1, T, 2)).astype(np.float32))
        jax.block_until_ready(z)
        zpool.append((z, jnp.zeros((1, 1, 2), jnp.float32)))
    f0 = jax.jit(lambda x, c: freq_demod_planar(x, c))
    res["demod_flat_ms"] = round(timed(f0, zpool) * 1e3, 1)

    def demod_folded(x, c, R=256):
        C, T2, _ = x.shape
        xr = x.reshape(C * R, T2 // R, 2)
        # prev of row r = last sample of row r-1; row 0 uses the carry
        heads = jnp.concatenate([c, xr[:-1, -1:, :]], axis=0)
        y, _last = freq_demod_planar(xr, heads)
        return y.reshape(C, T2), xr[-1:, -1:, :]

    f1 = jax.jit(demod_folded)
    res["demod_fold256_ms"] = round(timed(f1, zpool) * 1e3, 1)
    y0 = np.asarray(f0(*zpool[0])[0]).reshape(-1)
    y1 = np.asarray(f1(*zpool[0])[0]).reshape(-1)
    res["demod_fold_maxerr"] = float(np.max(np.abs(y0 - y1)))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
