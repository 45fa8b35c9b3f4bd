"""Fused-chain compiler tests: the single jitted program must match the
streaming executor running the same blocks, within float32 tolerance."""

import numpy as np
import jax.numpy as jnp
import pytest

from pothoscomms_tpu import BlockRegistry, Topology
from pothoscomms_tpu.core.fixtures import CollectorSink, FeederSource
from pothoscomms_tpu.parallel import cplx
from pothoscomms_tpu.parallel.compiler import compile_chain, run_chain_numpy


def stream_reference(blocks, x_rows, dtype):
    """Run each channel's stream through a fresh copy of the block chain
    in the streaming executor."""
    outs = []
    for row in x_rows:
        feed = FeederSource(dtype)
        feed.feed_buffer(np.ascontiguousarray(row))
        sink_dtype = dtype
        chain = [feed] + [b() for b in blocks]
        # the final block's output dtype may differ (envelope/demod)
        last = chain[-1]
        out_dt = list(last.outputs.values())[0].dtype
        sink = CollectorSink(str(out_dt) if out_dt else dtype)
        topo = Topology()
        for a, b in zip(chain[:-1], chain[1:]):
            topo.connect(a, 0, b, 0)
        topo.connect(chain[-1], 0, sink, 0)
        topo.commit()
        assert topo.wait_inactive()
        outs.append(sink.get_buffer())
    return np.stack(outs)


def iir_ref(x, taps):
    half = len(taps) // 2
    b = np.asarray(taps[:half], float)
    a = np.asarray(taps[half:], float)
    b, a = b / a[0], a / a[0]
    y = np.zeros(len(x))
    for n in range(len(x)):
        acc = 0.0
        for i in range(len(b)):
            if n - i >= 0:
                acc += b[i] * x[n - i]
        for i in range(1, len(a)):
            if n - i >= 0:
                acc -= a[i] * y[n - i]
        y[n] = acc
    return y


def test_fused_scale_fir_iir_chain_real():
    """Fused chain vs a numpy oracle of the same (zero-initial-history
    causal) semantics. NB: the STREAMING fir block reproduces the
    reference's startup behavior instead — its first output corresponds
    to input K-1 (circular-buffer history priming, FIRFilter.cpp:305);
    the fused core uses the standard x[<0]=0 convolution."""
    rng = np.random.default_rng(0)
    C, T = 4, 512
    x = rng.normal(size=(C, T)).astype(np.float32)
    taps = rng.normal(size=31) / 31
    iir_taps = [0.2, 0.3, 1.0, -0.4]

    scale = BlockRegistry.make("/comms/scale", "float32")
    scale.set_factor(1.5)
    fir = BlockRegistry.make("/comms/fir_filter", "float32", "REAL")
    fir.set_taps(taps)
    iir = BlockRegistry.make("/comms/iir_filter", "float32")
    iir.set_taps(iir_taps)

    step, carry = compile_chain([scale, fir, iir], channels=C)
    y, carry = run_chain_numpy(step, carry, x)
    ref = np.stack([
        iir_ref(np.convolve(1.5 * x[c], taps, mode="full")[:T], iir_taps)
        for c in range(C)
    ])
    np.testing.assert_allclose(y, ref, atol=1e-4)


def test_fused_fm_receive_chain():
    # BASELINE config: freq_demod -> dc_removal -> envelope, complex in
    rng = np.random.default_rng(1)
    C, T = 3, 400
    phase = np.cumsum(rng.normal(size=(C, T)) * 0.2, axis=1)
    x = np.exp(1j * phase).astype(np.complex64)

    def mk_demod():
        return BlockRegistry.make("/comms/freq_demod", "complex_float32")

    def mk_dc():
        b = BlockRegistry.make("/comms/dc_removal", "float32")
        b.set_average_size(16)
        b.set_cascade_size(2)
        return b

    def mk_env():
        b = BlockRegistry.make("/comms/envelope_detector", "float32")
        b.set_attack(4.0)
        b.set_release(16.0)
        return b

    blocks = [mk_demod(), mk_dc(), mk_env()]
    step, carry = compile_chain(blocks, channels=C)
    y, carry = run_chain_numpy(step, carry, x)
    ref = stream_reference([mk_demod, mk_dc, mk_env], x, "complex_float32")
    np.testing.assert_allclose(y, ref, atol=1e-3)


def test_fused_chain_carry_across_blocks():
    # two half-length calls == one full-length call
    rng = np.random.default_rng(2)
    C, T = 2, 256
    x = rng.normal(size=(C, 2 * T)).astype(np.float32)
    taps = rng.normal(size=17) / 17

    def mk_fir():
        b = BlockRegistry.make("/comms/fir_filter", "float32", "REAL")
        b.set_taps(taps)
        return b

    step, carry = compile_chain([mk_fir()], channels=C)
    y_full, _ = run_chain_numpy(step, carry, x)
    step2, carry2 = compile_chain([mk_fir()], channels=C)
    y1, carry2 = run_chain_numpy(step2, carry2, x[:, :T])
    y2, carry2 = run_chain_numpy(step2, carry2, x[:, T:])
    np.testing.assert_allclose(np.concatenate([y1, y2], axis=1), y_full,
                               atol=1e-5)


def test_fused_chain_with_terminal_fft():
    rng = np.random.default_rng(3)
    C, T, NB = 2, 512, 128
    x = (rng.normal(size=(C, T)) + 1j * rng.normal(size=(C, T))).astype(
        np.complex64
    )
    taps = rng.normal(size=9) / 9

    fir = BlockRegistry.make("/comms/fir_filter", "complex_float32", "REAL")
    fir.set_taps(taps)
    fft = BlockRegistry.make("/comms/fft", "complex_float32", NB, False)
    step, carry = compile_chain([fir, fft], channels=C)
    spec, carry = step(jnp.asarray(cplx.to_planar(x)), carry)
    assert spec.shape == (C, T // NB, NB, 2)
    y0 = np.convolve(x[0], taps, mode="full")[:T]
    exp = np.fft.fft(y0[:NB])
    np.testing.assert_allclose(
        cplx.from_planar(np.asarray(spec[0, 0])), exp, atol=2e-3
    )


def test_unfusable_block_raises():
    corr = BlockRegistry.make("/comms/preamble_correlator")
    with pytest.raises(TypeError):
        compile_chain([corr], channels=1)


def test_rational_fir_device_core_compiles():
    """Round 4: rational rates get a device core too (blocked-Toeplitz
    rational matmul) — a 2:1 decimator compiles and halves the length."""
    import jax.numpy as jnp

    fir = BlockRegistry.make("/comms/fir_filter", "float32", "REAL")
    fir.set_taps(np.asarray([0.25, 0.5, 0.25]))
    fir.set_decimation(2)
    step, carry = compile_chain([fir], channels=2)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 512)).astype(np.float32))
    y, carry2 = step(x, carry)
    assert y.shape == (2, 256)


def test_compile_chain_sharded_fm_matches_single_device():
    """BASELINE config #4: the FM chain (freq_demod -> dc_removal ->
    envelope) channel-sharded over the 8-device mesh via GSPMD must
    match the single-device fused chain exactly."""
    import jax
    from jax.sharding import Mesh
    from pothoscomms_tpu.parallel.compiler import compile_chain_sharded

    n = min(8, len(jax.devices()))
    mesh = Mesh(np.asarray(jax.devices()[:n]), ("ch",))
    C, T = 2 * n, 2048
    rng = np.random.default_rng(31)

    def build():
        demod = BlockRegistry.make("/comms/freq_demod", "complex_float32")
        dc = BlockRegistry.make("/comms/dc_removal", "float32")
        dc.set_average_size(16)
        dc.set_cascade_size(2)
        env = BlockRegistry.make("/comms/envelope_detector", "float32")
        env.set_attack(10.0)
        env.set_release(40.0)
        return [demod, dc, env]

    phase = np.cumsum(rng.uniform(-0.5, 0.5, size=(C, T)), axis=1)
    x = jnp.asarray(
        np.stack([np.cos(phase), np.sin(phase)], -1).astype(np.float32))

    step_s, carry_s = compile_chain_sharded(build(), C, mesh)
    with mesh:
        y_s, carry_s2 = step_s(x, carry_s)
        y_s2, _ = step_s(x * 0.5, carry_s2)

    step_1, carry_1 = compile_chain(build(), C)
    y_1, carry_12 = step_1(x, carry_1)
    y_12, _ = step_1(x * 0.5, carry_12)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(y_s2), np.asarray(y_12),
                               atol=1e-6)
