"""BASELINE.json config #5: full digital link, channel-sharded.

scrambler -> symbol_mapper -> frame_insert -> upsample -> channel ->
sharded sync search (device, shard_map over the 8-device CPU mesh) ->
frame automaton + header decode -> symbol_slicer -> descrambler.

Asserts bit-exact payload recovery on every channel with the receive
search sharded over the mesh, and that the sharded search equals the
single-device search exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import Mesh

from pothoscomms_tpu.parallel import cplx
from pothoscomms_tpu.parallel.link import (
    apply_channel,
    make_sharded_search,
    run_sharded_link,
    rx_decode,
    tx_waveform,
)


def make_mesh(n):
    devs = jax.devices()[:n]
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.asarray(devs), ("ch",))


def test_tx_waveform_structure():
    bits = np.array([1, 0, 1, 1, 0, 0, 1, 0], np.uint8)
    wave = tx_waveform(bits, symbol_width=20, data_width=4)
    # preamble(20*4) + header(58*4) + payload((8+16)*4) samples
    assert len(wave) == 20 * 4 + 58 * 4 + (8 + 16) * 4
    # rectangular pulses: 4 identical samples per symbol
    w4 = wave.reshape(-1, 4)
    assert np.allclose(w4, w4[:, :1])
    # BPSK: all +-1
    assert np.allclose(np.abs(wave), 1.0)


def test_single_channel_roundtrip():
    mesh = make_mesh(1)
    res = run_sharded_link(mesh, n_channels=1, n_bits=48, seed=3)
    assert res["all_exact"], res


def test_sharded_link_bit_exact_8dev():
    mesh = make_mesh(8)
    res = run_sharded_link(mesh, n_channels=16, n_bits=64, seed=7)
    assert res["all_exact"], res


def test_sharded_link_with_noise():
    mesh = make_mesh(8)
    res = run_sharded_link(mesh, n_channels=8, n_bits=64, seed=11,
                           noise=0.02)
    assert res["all_exact"], res


def test_sharded_search_matches_single_device():
    """The shard_map'd search must equal the single-device batched
    search bit for bit (same program, partitioned data)."""
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, 32).astype(np.uint8)
    wave = apply_channel(tx_waveform(bits), attenuation=0.6, phase=0.4,
                         freq_offset=5e-5)
    C = 8
    mesh8 = make_mesh(8)
    mesh1 = make_mesh(1)
    s8, lp, n_pad = make_sharded_search(mesh8, [1.0], 20, 4, 0.01, len(wave))
    s1, lp1, n_pad1 = make_sharded_search(mesh1, [1.0], 20, 4, 0.01,
                                          len(wave))
    assert (lp, n_pad) == (lp1, n_pad1)
    x = np.zeros((C, lp, 2), np.float32)
    for c in range(C):
        x[c, : len(wave)] = cplx.to_planar(wave * (0.8 + 0.05 * c))
    a8 = s8(jnp.asarray(x))
    a1 = s1(jnp.asarray(x))
    for v8, v1 in zip(a8, a1):
        np.testing.assert_array_equal(np.asarray(v8), np.asarray(v1))
