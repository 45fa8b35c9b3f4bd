"""Probe which XLA primitives the axon TPU backend supports (f32/planar).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benches/probe_prims.py
"""

import numpy as np
import jax
import jax.numpy as jnp

f32 = jnp.float32

TESTS = {
    "sum_axis": lambda: jnp.sum(jnp.ones((4, 8), f32), axis=1),
    "patches": lambda: jax.lax.conv_general_dilated_patches(
        jnp.ones((1, 1, 32), f32), (8,), (1,), "VALID"),
    "atan2": lambda: jnp.arctan2(jnp.ones(4, f32), jnp.ones(4, f32)),
    "floor": lambda: jnp.floor(jnp.ones(4, f32) * 1.5),
    "where": lambda: jnp.where(jnp.ones(4, f32) > 0, 1.0, 0.0),
    "cos": lambda: jnp.cos(jnp.ones(4, f32)),
    "concat": lambda: jnp.concatenate([jnp.ones((2, 2), f32)] * 2, axis=0),
    "pad": lambda: jnp.pad(jnp.ones(4, f32), (1, 1)),
    "conv_ones": lambda: jax.lax.conv_general_dilated(
        jnp.ones((1, 1, 32), f32), jnp.ones((1, 1, 8), f32), (1,), "VALID"),
    "conv_feat8": lambda: jax.lax.conv_general_dilated(
        jnp.ones((1, 8, 64), f32), jnp.ones((1, 8, 16), f32), (1,), "VALID"),
    "iota_bcast": lambda: (jnp.arange(8, dtype=f32)[None, :]
                           * jnp.ones((4, 1), f32)),
    "transpose": lambda: jnp.swapaxes(jnp.ones((4, 8, 2), f32), 0, 1),
    "slice": lambda: jnp.ones((16, 2), f32)[2:10],
    "dyn_slice": lambda: jax.lax.dynamic_slice(
        jnp.ones((16,), f32), (jnp.int32(2),), (4,)),
    "float_gather": lambda: jnp.ones((16,), f32)[jnp.arange(4)],
    "argmax": lambda: jnp.argmax(jnp.ones((8,), f32)),
    "cummax": lambda: jax.lax.cummax(jnp.ones((8,), f32)),
    "reduce_window": lambda: jax.lax.reduce_window(
        jnp.ones((16,), f32), 0.0, jax.lax.add, (4,), (1,), "VALID"),
    "exp": lambda: jnp.exp(jnp.ones(4, f32)),
    "sqrt": lambda: jnp.sqrt(jnp.ones(4, f32)),
    "bf16_matmul": lambda: jnp.matmul(jnp.ones((8, 8), jnp.bfloat16),
                                      jnp.ones((8, 8), jnp.bfloat16)),
    "int8_cast": lambda: (jnp.ones(4, f32) > 0).astype(jnp.int8),
    "round": lambda: jnp.round(jnp.ones(4, f32) * 1.3),
    "sign": lambda: jnp.sign(jnp.ones(4, f32) - 0.5),
}


def main():
    print("default backend:", jax.default_backend(), flush=True)
    for name, f in TESTS.items():
        try:
            np.asarray(f())
            print(name, "OK", flush=True)
        except Exception as e:
            print(name, "FAIL:", str(e)[:90], flush=True)


if __name__ == "__main__":
    main()
