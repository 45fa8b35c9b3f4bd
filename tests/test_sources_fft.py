"""Waveform/noise source and FFT block tests.

Mirrors reference tests: fft/TestFFT.cpp (numpy golden vectors, float and
scaled-int16 modes, ifft round trip) plus behavioral contracts of
waveform/WaveformSource.cpp and waveform/NoiseSource.cpp (no reference test
file exists for the sources; contracts from the implementation).
"""

import numpy as np
import pytest

from pothoscomms_tpu import BlockRegistry, Topology
from pothoscomms_tpu.core.fixtures import CollectorSink, FeederSource, VectorSource
from pothoscomms_tpu.core.testing import (
    assert_buffers_close,
    from_complex_int,
    to_complex_int,
)


def run_chain(src, blocks, sink, n_source=None):
    topo = Topology()
    chain = [src] + blocks + [sink]
    for a, b in zip(chain[:-1], chain[1:]):
        topo.connect(a, 0, b, 0)
    if n_source is not None:
        topo.run_source_elements(n_source)
    else:
        topo.commit()
        assert topo.wait_inactive()
    return sink.get_buffer()


# ---------------------------------------------------------------------- #
# FFT (reference: fft/TestFFT.cpp)
# ---------------------------------------------------------------------- #
FFT_IN = np.array([0.4 + 0.6j, -0.7 + 0.6j, -0.2 + 0.8j, 0.9 + 0.2j])
FFT_OUT = np.array([0.4 + 2.2j, 1.0 + 1.4j, 0.0 + 0.6j, 0.2 - 1.8j])


def test_fft_float():
    # forward (TestFFT.cpp:11-57)
    src = VectorSource("complex_float32")
    src.set_elements(FFT_IN.astype(np.complex64))
    fft = BlockRegistry.make("/comms/fft", "complex_float32", 4, False)
    sink = CollectorSink("complex_float32")
    out = run_chain(src, [fft], sink)
    assert_buffers_close(FFT_OUT, out, 0.01)

    # inverse is unnormalized: ifft(fft(x)) == x * N (TestFFT.cpp:59-81)
    src2 = VectorSource("complex_float32")
    src2.set_elements(FFT_OUT.astype(np.complex64))
    ifft = BlockRegistry.make("/comms/fft", "complex_float32", 4, True)
    sink2 = CollectorSink("complex_float32")
    out2 = run_chain(src2, [ifft], sink2)
    assert_buffers_close(FFT_IN * 4, out2, 0.01)


def test_fft_double_batched():
    # several windows queued -> batched transform, same per-window answers
    rng = np.random.default_rng(0)
    k, nb = 5, 64
    x = (rng.normal(size=k * nb) + 1j * rng.normal(size=k * nb))
    src = VectorSource("complex_float64")
    src.set_elements(x)
    fft = BlockRegistry.make("/comms/fft", "complex_float64", nb, False)
    sink = CollectorSink("complex_float64")
    out = run_chain(src, [fft], sink)
    exp = np.fft.fft(x.reshape(k, nb), axis=-1).reshape(-1)
    assert_buffers_close(exp, out, 1e-9)


def test_fft_short_scaled():
    # int16 forward is scaled by 1/N (TestFFT.cpp:84-133)
    x = to_complex_int(FFT_IN * 1000, "complex_int16")
    feed = FeederSource("complex_int16")
    feed.feed_buffer(x)
    fft = BlockRegistry.make("/comms/fft", "complex_int16", 4, False)
    sink = CollectorSink("complex_int16")
    out = run_chain(feed, [fft], sink)
    assert_buffers_close(FFT_OUT * 1000 / 4, from_complex_int(out), 0.01)

    # int16 inverse is the normalized inverse DFT (TestFFT.cpp:135-157)
    y = to_complex_int(FFT_OUT * 1000, "complex_int16")
    feed2 = FeederSource("complex_int16")
    feed2.feed_buffer(y)
    ifft = BlockRegistry.make("/comms/fft", "complex_int16", 4, True)
    sink2 = CollectorSink("complex_int16")
    out2 = run_chain(feed2, [ifft], sink2)
    assert_buffers_close(FFT_IN * 1000, from_complex_int(out2), 0.01)


def test_fft_reserve_partial_window():
    # fewer than numBins queued -> nothing consumed or produced
    feed = FeederSource("complex_float32")
    feed.feed_buffer(np.ones(7, np.complex64))
    fft = BlockRegistry.make("/comms/fft", "complex_float32", 8, False)
    sink = CollectorSink("complex_float32")
    out = run_chain(feed, [fft], sink)
    assert out.shape == (0,)
    assert fft.input(0).elements() == 7


def test_fft_rejects_bad_dtypes():
    with pytest.raises(ValueError):
        BlockRegistry.make("/comms/fft", "float32", 8, False)
    with pytest.raises(ValueError):
        BlockRegistry.make("/comms/fft", "complex_int32", 8, False)


# ---------------------------------------------------------------------- #
# Waveform source (reference: waveform/WaveformSource.cpp)
# ---------------------------------------------------------------------- #
def make_waveform(dtype, wave, freq=0.1, rate=1.0, ampl=1.0, offset=0.0):
    blk = BlockRegistry.make("/comms/waveform_source", dtype)
    blk.set_waveform(wave)
    blk.set_frequency(freq)
    blk.set_sample_rate(rate)
    blk.set_amplitude(ampl)
    blk.set_offset(offset)
    return blk


def test_waveform_sine_complex():
    n = 1024
    src = make_waveform("complex_float64", "SINE", freq=0.1)
    sink = CollectorSink("complex_float64")
    out = run_chain(src, [], sink, n_source=n)
    assert out.shape[0] >= n
    out = out[:n]
    # table size 4096, step = round(0.1*4096) = 410 -> actual frequency
    step = 410 / 4096
    exp = np.exp(2j * np.pi * step * np.arange(n))
    assert_buffers_close(exp, out, 1e-9)
    # quadrature: |out| == 1, im lags re by 90 deg
    np.testing.assert_allclose(np.abs(out), 1.0, atol=1e-12)


def test_waveform_real_is_cosine():
    # real dtype keeps the real part of the rotating phasor (setElem :249-253)
    n = 256
    src = make_waveform("float32", "SINE", freq=0.25, ampl=2.0, offset=0.5)
    sink = CollectorSink("float32")
    out = run_chain(src, [], sink, n_source=n)[:n]
    step = round(0.25 * 4096) / 4096
    exp = 2.0 * np.cos(2 * np.pi * step * np.arange(n)) + 0.5
    assert_buffers_close(exp, out, 1e-5)


def test_waveform_const_and_int():
    n = 64
    src = make_waveform("int16", "CONST", freq=0.0, ampl=123.7)
    sink = CollectorSink("int16")
    out = run_chain(src, [], sink, n_source=n)[:n]
    assert np.all(out == 123)  # C cast truncates


def test_waveform_square_ramp():
    n = 4096
    src = make_waveform("float64", "SQUARE", freq=1.0 / 16.0)
    sink = CollectorSink("float64")
    out = run_chain(src, [], sink, n_source=n)[:n]
    assert set(np.unique(out)) <= {0.0, 1.0}
    # 50% duty cycle
    assert abs(out.mean() - 0.5) < 0.05

    src = make_waveform("float64", "RAMP", freq=1.0 / 16.0)
    sink = CollectorSink("float64")
    out = run_chain(src, [], sink, n_source=n)[:n]
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_waveform_auto_table_growth():
    # tiny frequency: 4096-entry table gives step<16, table must grow
    # until step >= 16 (reference :186-196)
    src = make_waveform("complex_float64", "SINE", freq=1e-4)
    src._active = True
    src._update_table()
    assert src._step >= 16
    size = src._mask + 1
    assert size > 4096 and (size & (size - 1)) == 0
    assert src._step == round(1e-4 * size)


def test_waveform_step_not_achievable():
    src = make_waveform("complex_float64", "SINE", freq=1e-9)
    src._active = True
    with pytest.raises(ValueError):
        src._update_table()


def test_waveform_negative_freq():
    n = 512
    src = make_waveform("complex_float64", "SINE", freq=-0.1)
    sink = CollectorSink("complex_float64")
    out = run_chain(src, [], sink, n_source=n)[:n]
    step = 410 / 4096
    exp = np.exp(-2j * np.pi * step * np.arange(n))
    assert_buffers_close(exp, out, 1e-9)


# ---------------------------------------------------------------------- #
# Noise source (reference: waveform/NoiseSource.cpp)
# ---------------------------------------------------------------------- #
def collect_noise(dtype, wave, n, fast=True, mean=0.0, b=1.0, ampl=1.0, seed=7):
    src = BlockRegistry.make("/comms/noise_source", dtype, seed)
    src.set_waveform(wave)
    src.set_mean(mean)
    src.set_b(b)
    src.set_fast(fast)
    src.set_amplitude(ampl)
    sink = CollectorSink(dtype)
    return run_chain(src, [], sink, n_source=n)[:n]


@pytest.mark.parametrize("fast", [True, False])
def test_noise_normal_stats(fast):
    out = collect_noise("float64", "NORMAL", 40000, fast=fast, mean=1.0, b=2.0)
    assert abs(out.mean() - 1.0) < 0.15
    assert abs(out.std() - 2.0) < 0.2


def test_noise_uniform_range():
    out = collect_noise("float64", "UNIFORM", 20000, mean=5.0, b=2.0)
    assert out.min() >= 3.0 and out.max() <= 7.0
    assert abs(out.mean() - 5.0) < 0.2


def test_noise_poisson_int():
    out = collect_noise("int32", "POISSON", 20000, mean=4.0)
    assert np.all(out >= 0)
    assert abs(out.mean() - 4.0) < 0.3
    assert abs(out.var() - 4.0) < 0.8


def test_noise_complex_independent_iq():
    out = collect_noise("complex_float64", "NORMAL", 20000)
    corr = np.corrcoef(out.real, out.imag)[0, 1]
    assert abs(corr) < 0.1


def test_noise_laplace_quirk_zero_mean():
    # the reference's Laplace synthesis (NoiseSource.cpp:243-249) draws
    # u ~ U(mean-b, mean+b); only at mean=0, b=1 does that yield a true
    # Laplace(0, 1) (|x| = -ln(1-|u|) ~ Exp(1)), var = 2
    out = collect_noise("float64", "LAPLACE", 40000, mean=0.0, b=1.0)
    assert abs(out.mean()) < 0.1
    assert abs(out.var() - 2.0) < 0.3


def test_noise_bad_wave():
    src = BlockRegistry.make("/comms/noise_source", "float32")
    with pytest.raises(ValueError):
        src.set_waveform("BOGUS")
