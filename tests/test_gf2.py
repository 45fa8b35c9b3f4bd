"""ops/gf2.py: the blocked GF(2) LFSR state-space must be bit-exact
with the scalar Galois recursion for every mode, and ops/digital_device
cores must match their numpy streaming counterparts (incl. signed
two's-complement wraps)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pothoscomms_tpu.ops import gf2
from pothoscomms_tpu.ops import digital_device as dd
from pothoscomms_tpu.blocks.digital import GaloisLFSR

rng = np.random.default_rng(11)


@pytest.mark.parametrize("mode", ["additive", "scramble", "descramble"])
@pytest.mark.parametrize("poly,seed", [(0x19, 1), (0x8E, 0x6F),
                                       ((1 << 31) | (1 << 3) | 1, 12345)])
def test_blocked_lfsr_bit_exact(mode, poly, seed):
    Lb = 64
    T = Lb * 7
    x = rng.integers(0, 2, (1, T)).astype(np.float32)
    V, Lst, G, Ab, auto = gf2.lfsr_blocked_operators(poly, mode, Lb)
    s0 = gf2.export_state(seed)[None]
    f = jax.jit(lambda s, xx: gf2.lfsr_blocked_step(
        s, xx, jnp.asarray(V, jnp.float32), jnp.asarray(Lst, jnp.float32),
        jnp.asarray(G, jnp.float32), jnp.asarray(Ab, jnp.float32), auto))
    s1, o = f(jnp.asarray(s0), jnp.asarray(x))
    l = GaloisLFSR(poly, seed)
    xb = x[0].astype(np.uint8)
    if mode == "additive":
        ref = xb ^ l.keystream(T)
    elif mode == "scramble":
        ref = l.scramble_mult(xb)
    else:
        ref = l.descramble_mult(xb)
    np.testing.assert_array_equal(
        np.asarray(o[0]).astype(np.uint8), ref)
    assert gf2.import_state(np.asarray(s1[0])) == l.data


def test_blocked_lfsr_multi_channel_states():
    """Independent per-channel states evolve independently."""
    Lb = 32
    T = Lb * 3
    poly = 0x8E
    x = rng.integers(0, 2, (3, T)).astype(np.float32)
    V, Lst, G, Ab, auto = gf2.lfsr_blocked_operators(poly, "scramble", Lb)
    seeds = [1, 99, 12345]
    s0 = np.stack([gf2.export_state(s) for s in seeds])
    s1, o = jax.jit(lambda s, xx: gf2.lfsr_blocked_step(
        s, xx, jnp.asarray(V, jnp.float32), jnp.asarray(Lst, jnp.float32),
        jnp.asarray(G, jnp.float32), jnp.asarray(Ab, jnp.float32),
        auto))(jnp.asarray(s0), jnp.asarray(x))
    for c, seed in enumerate(seeds):
        l = GaloisLFSR(poly, seed)
        ref = l.scramble_mult(x[c].astype(np.uint8))
        np.testing.assert_array_equal(
            np.asarray(o[c]).astype(np.uint8), ref)
        assert gf2.import_state(np.asarray(s1[c])) == l.data


def test_signed_bitwise_wrap_exact():
    a = rng.integers(-128, 128, 500).astype(np.int8)
    b = rng.integers(-128, 128, 500).astype(np.int8)
    af = jnp.asarray(a[None].astype(np.float32))
    bf = jnp.asarray(b[None].astype(np.float32))
    for op, f in (("AND", np.bitwise_and), ("OR", np.bitwise_or),
                  ("XOR", np.bitwise_xor)):
        core = dd.signed_wrap(dd.bitwise_binary_core(op, 8), 8, nargs=2)
        y = jax.jit(core)(af, bf)
        np.testing.assert_array_equal(
            np.asarray(y[0]).astype(np.int8), f(a, b))
    core = dd.signed_wrap(dd.bitwise_not_core(8), 8)
    y = jax.jit(core)(af)
    np.testing.assert_array_equal(np.asarray(y[0]).astype(np.int8), ~a)
    # left shift wraps; right shift is arithmetic (floor division)
    core = dd.signed_wrap(dd.bitshift_core(True, 3, 8), 8)
    y = jax.jit(core)(af)
    np.testing.assert_array_equal(np.asarray(y[0]).astype(np.int8),
                                  (a << 3).astype(np.int8))
    core = dd.bitshift_core(False, 2, 8)
    y = jax.jit(core)(af)
    np.testing.assert_array_equal(np.asarray(y[0]).astype(np.int8), a >> 2)


def test_diff_decode_uint32_wrap_semantics():
    """Out-of-range symbols hit the C uint32 wrap; N = 3 does not
    divide 2^32, so the floor-mod shortcut would be wrong."""
    N = 3
    x = np.array([0, 255, 0, 7, 200], np.uint8)
    last = 250
    core = dd.diff_decode_core(N)
    c, y = jax.jit(core)(jnp.full((1, 1), float(last), jnp.float32),
                         jnp.asarray(x[None].astype(np.float32)))
    prev = np.concatenate([[last], x[:-1]]).astype(np.int64)
    ref = ((x.astype(np.int64) - prev + N) % (1 << 32)) % N
    np.testing.assert_array_equal(np.asarray(y[0]).astype(np.int64), ref)
