"""Auto-fusion tests: the Topology executor must transparently execute
linear device-core runs as one jitted program under load, with output
identical (f32 tolerance) to the pure streaming path — including across
engage/disengage boundaries (labels, reconfig, drain).

VERDICT r2 #1: "the scheduler IS the delivery vehicle for block
performance" (SURVEY.md §1 L0).
"""

import numpy as np
import pytest

from pothoscomms_tpu import BlockRegistry, Topology
from pothoscomms_tpu.core.fixtures import CollectorSink, FeederSource
from pothoscomms_tpu.core.fusion import DeviceChunk
from pothoscomms_tpu.core.labels import Label

THRESH = 4096  # low threshold so tests engage with small data


def run_chain(build, feeds, fuse: bool, threshold=THRESH, collect=True):
    """Build feeder -> chain -> collector, feed buffers (with optional
    labels), run to quiescence; returns (collector, topology)."""
    blocks, dtype_in, dtype_out = build()
    feed = FeederSource(dtype_in)
    sink = CollectorSink(dtype_out)
    topo = Topology()
    if not fuse:
        topo.auto_fuse = False
    topo.fuse_threshold = threshold
    chain = [feed] + blocks + [sink]
    for a, b in zip(chain[:-1], chain[1:]):
        topo.connect(a, 0, b, 0)
    for item in feeds:
        if isinstance(item, tuple):
            feed.feed_buffer(item[0], item[1])
        else:
            feed.feed_buffer(item)
    topo.commit()
    assert topo.wait_inactive(timeout=30.0)
    return sink, topo


def mk_fir_fft(nb=256, k=33, seed=7):
    rng = np.random.default_rng(seed)
    taps = (rng.normal(size=k) + 1j * rng.normal(size=k)) / k

    def build():
        fir = BlockRegistry.make("/comms/fir_filter", "complex_float32",
                                 "COMPLEX")
        fir.set_taps(taps)
        fft = BlockRegistry.make("/comms/fft", "complex_float32", nb, False)
        return [fir, fft], "complex_float32", "complex_float32"

    return build


def cplx(rng, n):
    return (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(
        np.complex64)


def assert_engaged(topo, times=1):
    segs = topo._segments
    assert segs, "no fused segment detected"
    assert sum(s.engage_count for s in segs) >= times, (
        f"segment never engaged: {[s.engage_count for s in segs]}")


def test_fir_fft_fused_matches_streaming():
    rng = np.random.default_rng(0)
    feeds = [cplx(rng, 3 * THRESH), cplx(rng, 2 * THRESH + 511)]
    s_fused, topo = run_chain(mk_fir_fft(), feeds, fuse=True)
    s_ref, _ = run_chain(mk_fir_fft(), feeds, fuse=False)
    assert_engaged(topo)
    a, b = s_fused.get_buffer(), s_ref.get_buffer()
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=2e-2)


def test_fir_fft_uses_combined_pair():
    """The FIR->FFT peephole must engage (combined operator) and the
    output must match the numpy oracle."""
    rng = np.random.default_rng(1)
    nb, k = 256, 17
    taps = (rng.normal(size=k) + 1j * rng.normal(size=k)) / k

    def build():
        fir = BlockRegistry.make("/comms/fir_filter", "complex_float32",
                                 "COMPLEX")
        fir.set_taps(taps)
        fft = BlockRegistry.make("/comms/fft", "complex_float32", nb, False)
        return [fir, fft], "complex_float32", "complex_float32"

    x = cplx(rng, 4 * THRESH)
    sink, topo = run_chain(build, [x], fuse=True)
    assert_engaged(topo)
    got = sink.get_buffer()
    # streaming FIR primes with the first K-1 samples (reference :305)
    y = np.convolve(x, taps, mode="full")[k - 1: len(x)]
    m = len(y) // nb
    exp = np.fft.fft(y[: m * nb].reshape(m, nb), axis=-1).reshape(-1)
    np.testing.assert_allclose(got[: len(exp)], exp, atol=2e-2)


def test_fm_chain_fused_matches_streaming():
    def build():
        demod = BlockRegistry.make("/comms/freq_demod", "complex_float32")
        dc = BlockRegistry.make("/comms/dc_removal", "float32")
        dc.set_average_size(32)
        dc.set_cascade_size(2)
        env = BlockRegistry.make("/comms/envelope_detector", "float32")
        env.set_attack(4.0)
        env.set_release(16.0)
        return [demod, dc, env], "complex_float32", "float32"

    rng = np.random.default_rng(2)
    phase = np.cumsum(rng.normal(size=3 * THRESH) * 0.2)
    feeds = [np.exp(1j * phase).astype(np.complex64),
             np.exp(1j * phase[::-1]).astype(np.complex64)]
    s_fused, topo = run_chain(build, feeds, fuse=True)
    s_ref, _ = run_chain(build, feeds, fuse=False)
    assert_engaged(topo)
    np.testing.assert_allclose(s_fused.get_buffer(), s_ref.get_buffer(),
                               atol=1e-3)


def test_label_disengages_and_reengages():
    """A label mid-stream must disengage (streaming semantics for the
    labeled region), then re-engage on the next backlog; output
    identical either way and the label must reach the collector at the
    right index. (An interior FIR retains the label inside its K-1
    history window until the next slab flushes it, so re-engagement
    lands one backlog later — sustained-flow pattern.)"""
    def mk():
        scale = BlockRegistry.make("/comms/scale", "float32")
        scale.set_factor(2.0)
        fir = BlockRegistry.make("/comms/fir_filter", "float32", "REAL")
        fir.set_taps(np.hamming(21) / 10)
        return scale, fir

    rng = np.random.default_rng(3)
    primer = rng.normal(size=THRESH).astype(np.float32)
    big1 = rng.normal(size=3 * THRESH).astype(np.float32)
    small = rng.normal(size=500).astype(np.float32)
    big2 = rng.normal(size=3 * THRESH).astype(np.float32)
    big3 = rng.normal(size=3 * THRESH).astype(np.float32)

    def run(fuse):
        scale, fir = mk()
        feed = FeederSource("float32")
        sink = CollectorSink("float32")
        topo = Topology()
        topo.auto_fuse = fuse
        topo.fuse_threshold = THRESH
        for a, b in zip([feed, scale, fir], [scale, fir, sink]):
            topo.connect(a, 0, b, 0)
        feed.feed_buffer(primer)
        feed.feed_buffer(big1)
        topo.commit()
        assert topo.wait_inactive(timeout=30.0)
        feed.feed_buffer(small, [Label("mark", 1, 100)])
        feed.feed_buffer(big2)
        assert topo.wait_inactive(timeout=30.0)
        feed.feed_buffer(big3)
        assert topo.wait_inactive(timeout=30.0)
        return sink, topo

    s_fused, topo = run(True)
    s_ref, _ = run(False)
    assert_engaged(topo, times=2)  # engaged, disengaged on label, again
    np.testing.assert_allclose(s_fused.get_buffer(), s_ref.get_buffer(),
                               atol=1e-3)
    lf = [lb for lb in s_fused.get_labels() if lb.id == "mark"]
    lr = [lb for lb in s_ref.get_labels() if lb.id == "mark"]
    assert len(lf) == len(lr) == 1
    assert lf[0].index == lr[0].index


def test_reconfig_mid_stream_rebuilds_cores():
    """set_factor between feeds bumps the fuse epoch: the segment must
    rebuild and apply the new factor from the exact boundary."""
    def mk():
        scale = BlockRegistry.make("/comms/scale", "float32")
        scale.set_factor(2.0)
        fir = BlockRegistry.make("/comms/fir_filter", "float32", "REAL")
        fir.set_taps(np.hamming(9) / 5)
        return scale, fir

    rng = np.random.default_rng(4)
    x0 = rng.normal(size=THRESH).astype(np.float32)  # primer (streams)
    x1 = rng.normal(size=3 * THRESH).astype(np.float32)
    x2 = rng.normal(size=3 * THRESH).astype(np.float32)

    def run(fuse):
        scale, fir = mk()
        feed = FeederSource("float32")
        sink = CollectorSink("float32")
        topo = Topology()
        topo.auto_fuse = fuse
        topo.fuse_threshold = THRESH
        for a, b in zip([feed, scale, fir], [scale, fir, sink]):
            topo.connect(a, 0, b, 0)
        feed.feed_buffer(x0)
        feed.feed_buffer(x1)
        topo.commit()
        assert topo.wait_inactive(timeout=30.0)
        scale.set_factor(-0.5)
        feed.feed_buffer(x2)
        assert topo.wait_inactive(timeout=30.0)
        return sink.get_buffer(), topo

    got, topo = run(True)
    ref, _ = run(False)
    assert_engaged(topo, times=2)
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_fft_leftover_phase_preserved():
    """Feeds not frame-aligned: the FFT's sub-frame leftover must carry
    through engage/disengage without frame-phase drift."""
    rng = np.random.default_rng(5)
    nb = 128
    # misaligned sizes: leftover present at every boundary
    feeds = [cplx(rng, 2 * THRESH + 37), cplx(rng, 2 * THRESH + 91),
             cplx(rng, 300)]
    s_fused, topo = run_chain(mk_fir_fft(nb=nb, k=9), feeds, fuse=True)
    s_ref, _ = run_chain(mk_fir_fft(nb=nb, k=9), feeds, fuse=False)
    assert_engaged(topo)
    np.testing.assert_allclose(s_fused.get_buffer(), s_ref.get_buffer(),
                               atol=2e-2)


def test_iir_segment_state_continuity():
    def build():
        iir = BlockRegistry.make("/comms/iir_filter", "float32")
        iir.set_taps([0.2, 0.3, 1.0, -0.4])
        scale = BlockRegistry.make("/comms/scale", "float32")
        scale.set_factor(0.5)
        return [iir, scale], "float32", "float32"

    rng = np.random.default_rng(6)
    feeds = [rng.normal(size=2 * THRESH).astype(np.float32)
             for _ in range(3)]
    s_fused, topo = run_chain(build, feeds, fuse=True)
    s_ref, _ = run_chain(build, feeds, fuse=False)
    assert_engaged(topo)
    np.testing.assert_allclose(s_fused.get_buffer(), s_ref.get_buffer(),
                               atol=1e-3)


def test_signal_probe_rms_on_device_chunks():
    """Probe downstream of a fused segment: RMS over the last window
    must match numpy, computed on-device from DeviceChunks."""
    def mk():
        fir = BlockRegistry.make("/comms/fir_filter", "complex_float32",
                                 "REAL")
        fir.set_taps(np.hamming(15) / 8)
        return fir

    rng = np.random.default_rng(7)
    x = cplx(rng, 4 * THRESH)
    fir = mk()
    feed = FeederSource("complex_float32")
    probe = BlockRegistry.make("/comms/signal_probe", "complex_float32")
    probe.set_mode("RMS")
    probe.set_window(1024)
    fft = BlockRegistry.make("/comms/fft", "complex_float32", 256, False)
    topo = Topology()
    topo.fuse_threshold = THRESH
    topo.connect(feed, 0, fir, 0)
    topo.connect(fir, 0, fft, 0)
    topo.connect(fft, 0, probe, 0)
    feed.feed_buffer(x)
    topo.commit()
    assert topo.wait_inactive(timeout=30.0)
    assert_engaged(topo)
    taps = np.hamming(15) / 8
    y = np.convolve(x, taps, mode="full")[14: len(x)]
    m = len(y) // 256
    spec = np.fft.fft(y[: m * 256].reshape(m, 256), axis=-1).reshape(-1)
    exp = float(np.sqrt(np.mean(np.abs(spec[-1024:]) ** 2)))
    assert probe.value() == pytest.approx(exp, rel=1e-3)


def test_checkpoint_while_engaged(tmp_path):
    """save_state during fused execution folds carries back into block
    state; resume continues bit-identically to an un-fused run."""
    def build():
        fir = BlockRegistry.make("/comms/fir_filter", "float32", "REAL")
        fir.set_taps(np.hamming(13) / 7)
        env = BlockRegistry.make("/comms/envelope_detector", "float32")
        return [fir, env], "float32", "float32"

    rng = np.random.default_rng(8)
    x1 = rng.normal(size=2 * THRESH).astype(np.float32)
    x2 = rng.normal(size=2 * THRESH).astype(np.float32)

    blocks, di, do = build()
    feed = FeederSource(di)
    sink = CollectorSink(do)
    topo = Topology()
    topo.fuse_threshold = THRESH
    for a, b in zip([feed] + blocks, blocks + [sink]):
        topo.connect(a, 0, b, 0)
    feed.feed_buffer(x1)
    topo.commit()
    assert topo.wait_inactive(timeout=30.0)
    assert_engaged(topo)
    path = str(tmp_path / "ckpt.npz")
    topo.save_state(path)
    topo.load_state(path)
    feed.feed_buffer(x2)
    assert topo.wait_inactive(timeout=30.0)

    s_ref, _ = run_chain(build, [x1, x2], fuse=False)
    np.testing.assert_allclose(sink.get_buffer(), s_ref.get_buffer(),
                               atol=1e-3)


def test_device_chunk_protocol():
    import jax.numpy as jnp

    p = jnp.asarray(np.stack([np.arange(8.0), -np.arange(8.0)],
                             -1).astype(np.float32))
    ch = DeviceChunk(p, "complex_float32")
    assert ch.shape == (8,)
    assert len(ch) == 8
    arr = np.asarray(ch)
    assert arr.dtype == np.complex64
    np.testing.assert_allclose(arr.real, np.arange(8))
    sl = ch[2:5]
    assert isinstance(sl, DeviceChunk) and len(sl) == 3
    np.testing.assert_allclose(np.asarray(sl).imag, [-2, -3, -4])


def test_no_fusion_for_unsupported_dtype():
    """complex128 members must never fuse (f32 cores would downcast)."""
    def build():
        fir = BlockRegistry.make("/comms/fir_filter", "complex_float64",
                                 "REAL")
        fir.set_taps(np.hamming(9) / 5)
        fft = BlockRegistry.make("/comms/fft", "complex_float64", 128,
                                 False)
        return [fir, fft], "complex_float64", "complex_float64"

    rng = np.random.default_rng(9)
    x = (rng.normal(size=2 * THRESH)
         + 1j * rng.normal(size=2 * THRESH)).astype(np.complex128)
    sink, topo = run_chain(build, [x], fuse=True)
    assert all(s.engage_count == 0 for s in topo._segments)
    # and output is still correct via streaming
    assert len(sink.get_buffer()) > 0


def test_many_small_feeds_concat_pull():
    """Pulls spanning many queued parts (jitted concat path) must match
    streaming exactly; feeds deliberately misalign part boundaries."""
    def build():
        fir = BlockRegistry.make("/comms/fir_filter", "complex_float32",
                                 "REAL")
        fir.set_taps(np.hamming(11) / 6)
        fft = BlockRegistry.make("/comms/fft", "complex_float32", 64, False)
        return [fir, fft], "complex_float32", "complex_float32"

    rng = np.random.default_rng(11)
    feeds = [cplx(rng, int(n)) for n in
             rng.integers(300, 900, size=40)]  # ~24k elements, 40 parts

    def run(fuse):
        blocks, di, do = build()
        sink = CollectorSink(do)
        topo = Topology()
        topo.auto_fuse = fuse
        topo.fuse_threshold = 2048
        for a, b in zip(blocks, blocks[1:] + [sink]):
            topo.connect(a, 0, b, 0)
        # queue ALL parts up-front (a burst backlog): the engage pull
        # then spans dozens of parts through the jitted concat
        for part in feeds:
            blocks[0].input(0).push_buffer(part)
        topo.commit()
        assert topo.wait_inactive(timeout=30.0)
        return sink, topo

    s_fused, topo = run(True)
    s_ref, _ = run(False)
    assert_engaged(topo)
    np.testing.assert_allclose(s_fused.get_buffer(), s_ref.get_buffer(),
                               atol=2e-2)
