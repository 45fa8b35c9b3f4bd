"""Round-4 fusion breadth: the fuse protocol extends across the block
catalog (VERDICT r3 next #2) —

- elementwise hops (abs/rotate/const-arith/trig/...) join fused runs
  instead of de-fusing the chain;
- device-side sources head fused segments (table gather on device, no
  H2D per quantum), with exact index parity for WaveformSource;
- the BASELINE config #4 FM chain (noise -> freq_demod -> dc_removal ->
  envelope) engages as ONE source-headed segment;
- fan-out at a segment tail (scope probe tap) keeps the segment fused.
"""

import numpy as np
import pytest

from pothoscomms_tpu import BlockRegistry, Topology
from pothoscomms_tpu.core.fixtures import CollectorSink, FeederSource

THRESH = 4096


def _cplx(rng, n):
    return (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)


def _run(blocks, dtype_in, dtype_out, feeds, fuse, threshold=THRESH):
    feed = FeederSource(dtype_in)
    sink = CollectorSink(dtype_out)
    topo = Topology()
    topo.auto_fuse = fuse
    topo.fuse_threshold = threshold
    chain = [feed] + blocks + [sink]
    for a, b in zip(chain[:-1], chain[1:]):
        topo.connect(a, 0, b, 0)
    for f in feeds:
        feed.feed_buffer(f)
    topo.commit()
    assert topo.wait_inactive(timeout=30.0)
    return sink, topo


def _run_source(blocks, src, dtype_out, n, fuse, threshold=THRESH):
    sink = CollectorSink(dtype_out)
    topo = Topology()
    topo.auto_fuse = fuse
    topo.fuse_threshold = threshold
    chain = [src] + blocks + [sink]
    for a, b in zip(chain[:-1], chain[1:]):
        topo.connect(a, 0, b, 0)
    topo.commit()
    topo.run_source_elements(n)
    return sink, topo


# ------------------------------------------------------------------ #
# Elementwise hops fuse
# ------------------------------------------------------------------ #
def test_rotate_abs_chain_fuses():
    """rotate -> abs (complex->real transition inside the segment)."""
    def mk():
        rot = BlockRegistry.make("/comms/rotate", "complex_float32")
        rot.set_phase(0.7)
        ab = BlockRegistry.make("/comms/abs", "complex_float32")
        return [rot, ab]

    rng = np.random.default_rng(0)
    feeds = [_cplx(rng, 3 * THRESH), _cplx(rng, THRESH + 137)]
    s_f, topo = _run(mk(), "complex_float32", "float32", feeds, True)
    assert sum(s.engage_count for s in topo._segments) >= 1
    s_r, _ = _run(mk(), "complex_float32", "float32", feeds, False)
    np.testing.assert_allclose(s_f.get_buffer(), s_r.get_buffer(),
                               atol=1e-4)


def test_const_arith_trig_chain_fuses():
    """const_arithmetic (X*K) -> trigonometric (SIN) real-f32 run."""
    def mk():
        ca = BlockRegistry.make("/comms/const_arithmetic", "float32",
                                "X*K", 0.25)
        tr = BlockRegistry.make("/comms/trigonometric", "float32", "SIN")
        return [ca, tr]

    rng = np.random.default_rng(1)
    feeds = [rng.normal(size=4 * THRESH).astype(np.float32)]
    s_f, topo = _run(mk(), "float32", "float32", feeds, True)
    assert sum(s.engage_count for s in topo._segments) >= 1
    s_r, _ = _run(mk(), "float32", "float32", feeds, False)
    np.testing.assert_allclose(s_f.get_buffer(), s_r.get_buffer(),
                               atol=1e-5)


def test_complex_const_arith_fused_parity():
    """Complex X*K and K/X planar cores match the host complex path."""
    for op in ("X*K", "X+K", "K/X"):
        def mk():
            ca = BlockRegistry.make("/comms/const_arithmetic",
                                    "complex_float32", op, 0.5 - 0.25j)
            cj = BlockRegistry.make("/comms/conjugate", "complex_float32")
            return [ca, cj]

        rng = np.random.default_rng(2)
        feeds = [_cplx(rng, 3 * THRESH)]
        s_f, topo = _run(mk(), "complex_float32", "complex_float32",
                         feeds, True)
        assert sum(s.engage_count for s in topo._segments) >= 1, op
        s_r, _ = _run(mk(), "complex_float32", "complex_float32",
                      feeds, False)
        np.testing.assert_allclose(s_f.get_buffer(), s_r.get_buffer(),
                                   atol=1e-4, err_msg=op)


def test_scale_rotate_fir_fft_single_segment():
    """The VERDICT-named shape: scale -> rotate -> fir -> fft engages as
    ONE segment (with the FIR*DFT pair inside)."""
    rng = np.random.default_rng(3)
    k, nb = 17, 256
    taps = (rng.normal(size=k) + 1j * rng.normal(size=k)) / k

    def mk():
        sc = BlockRegistry.make("/comms/scale", "complex_float32")
        sc.set_factor(1.5)
        rot = BlockRegistry.make("/comms/rotate", "complex_float32")
        rot.set_phase(-0.3)
        fir = BlockRegistry.make("/comms/fir_filter", "complex_float32",
                                 "COMPLEX")
        fir.set_taps(taps)
        fft = BlockRegistry.make("/comms/fft", "complex_float32", nb, False)
        return [sc, rot, fir, fft]

    feeds = [_cplx(rng, 4 * THRESH), _cplx(rng, 2 * THRESH + 300)]
    s_f, topo = _run(mk(), "complex_float32", "complex_float32", feeds, True)
    segs = topo._segments
    assert len(segs) == 1 and len(segs[0].blocks) == 4
    assert segs[0].engage_count >= 1
    s_r, _ = _run(mk(), "complex_float32", "complex_float32", feeds, False)
    a, b = s_f.get_buffer(), s_r.get_buffer()
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=2e-2)


# ------------------------------------------------------------------ #
# Source-headed segments
# ------------------------------------------------------------------ #
def test_waveform_source_headed_segment_exact():
    """waveform -> scale -> rotate: engages as one source-headed segment
    with EXACT table-index parity vs the streaming path."""
    def mk():
        src = BlockRegistry.make("/comms/waveform_source", "complex_float32")
        src.set_waveform("SINE")
        src.set_frequency(1000.0)
        src.set_sample_rate(48000.0)
        sc = BlockRegistry.make("/comms/scale", "complex_float32")
        sc.set_factor(0.5)
        rot = BlockRegistry.make("/comms/rotate", "complex_float32")
        rot.set_phase(0.2)
        return src, [sc, rot]

    n = 6 * THRESH
    src, blocks = mk()
    s_f, topo = _run_source(blocks, src, "complex_float32", n, True)
    seg = topo._segments[0]
    assert seg.source is src and seg.engage_count >= 1
    src2, blocks2 = mk()
    s_r, _ = _run_source(blocks2, src2, "complex_float32", n, False)
    a, b = s_f.get_buffer(), s_r.get_buffer()
    assert a.shape == b.shape == (n,)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_waveform_source_index_continuity():
    """Quota granted in two batches: engage/disengage across batches must
    keep the table index exact (export/import round trip)."""
    def mk():
        src = BlockRegistry.make("/comms/waveform_source", "complex_float32")
        src.set_waveform("SINE")
        src.set_frequency(3172.0)
        src.set_sample_rate(48000.0)
        sc = BlockRegistry.make("/comms/scale", "complex_float32")
        sc.set_factor(2.0)
        return src, [sc]

    src, blocks = mk()
    sink = CollectorSink("complex_float32")
    topo = Topology()
    topo.fuse_threshold = THRESH
    chain = [src] + blocks + [sink]
    for a, b in zip(chain[:-1], chain[1:]):
        topo.connect(a, 0, b, 0)
    topo.commit()
    topo.run_source_elements(3 * THRESH + 77)
    topo.run_source_elements(2 * THRESH + 13)
    got = sink.get_buffer()

    src2, blocks2 = mk()
    s_r, _ = _run_source(blocks2, src2, "complex_float32",
                         len(got), False)
    np.testing.assert_allclose(got, s_r.get_buffer(), atol=1e-5)


def test_fm_chain_source_headed_single_segment():
    """BASELINE config #4 shape: noise -> freq_demod -> dc_removal ->
    envelope engages as ONE 4-block source-headed segment; parity with
    the streaming path is statistical (fast-mode noise has no
    deterministic sequence contract)."""
    def mk(seed):
        src = BlockRegistry.make("/comms/noise_source", "complex_float32",
                                 seed)
        src.set_waveform("NORMAL")
        src.set_fast(True)
        demod = BlockRegistry.make("/comms/freq_demod", "complex_float32")
        dc = BlockRegistry.make("/comms/dc_removal", "float32")
        dc.set_average_size(32)
        dc.set_cascade_size(2)
        env = BlockRegistry.make("/comms/envelope_detector", "float32")
        env.set_attack(4.0)
        env.set_release(16.0)
        return src, [demod, dc, env]

    n = 8 * THRESH
    src, blocks = mk(11)
    s_f, topo = _run_source(blocks, src, "float32", n, True)
    seg = topo._segments[0]
    assert seg.source is src and len(seg.blocks) == 4
    assert seg.engage_count >= 1
    src2, blocks2 = mk(11)
    s_r, _ = _run_source(blocks2, src2, "float32", n, False)
    a, b = s_f.get_buffer(), s_r.get_buffer()
    assert a.shape == b.shape == (n,)
    # same pool statistics: envelope RMS/mean agree within a few percent
    assert np.mean(a) == pytest.approx(np.mean(b), rel=0.05)
    assert np.sqrt(np.mean(a * a)) == pytest.approx(
        np.sqrt(np.mean(b * b)), rel=0.05)


# ------------------------------------------------------------------ #
# Fan-out at the segment tail (scope probe tap)
# ------------------------------------------------------------------ #
def test_probe_tap_at_tail_stays_fused():
    """scale -> fir with a SignalProbe tapped off the FIR output next to
    the sink: the segment must stay fused and the probe RMS must match
    the streaming value (VERDICT r3 next #6)."""
    rng = np.random.default_rng(4)
    k = 9
    taps = (rng.normal(size=k) + 1j * rng.normal(size=k)) / k

    def mk():
        sc = BlockRegistry.make("/comms/scale", "complex_float32")
        sc.set_factor(1.2)
        fir = BlockRegistry.make("/comms/fir_filter", "complex_float32",
                                 "COMPLEX")
        fir.set_taps(taps)
        return sc, fir

    # two buffers: the first streams (priming the FIR's K-1 interior
    # retention), the second engages the segment — fusion is a
    # sustained-load turbo, not a cold-start mode
    feeds = [_cplx(rng, 4 * THRESH), _cplx(rng, 4 * THRESH)]

    def run(fuse):
        sc, fir = mk()
        feed = FeederSource("complex_float32")
        sink = CollectorSink("complex_float32")
        probe = BlockRegistry.make("/comms/signal_probe", "complex_float32")
        probe.set_mode("RMS")
        probe.set_window(1 << 20)
        topo = Topology()
        topo.auto_fuse = fuse
        topo.fuse_threshold = THRESH
        topo.connect(feed, 0, sc, 0)
        topo.connect(sc, 0, fir, 0)
        topo.connect(fir, 0, sink, 0)
        topo.connect(fir, 0, probe, 0)
        for f in feeds:
            feed.feed_buffer(f)
        topo.commit()
        assert topo.wait_inactive(timeout=30.0)
        return sink, probe, topo

    s_f, p_f, topo = run(True)
    segs = topo._segments
    assert len(segs) == 1 and len(segs[0].blocks) == 2, (
        "probe tap at the tail must not break the run")
    assert segs[0].engage_count >= 1
    s_r, p_r, _ = run(False)
    np.testing.assert_allclose(s_f.get_buffer(), s_r.get_buffer(),
                               atol=1e-3)
    assert p_f.value() == pytest.approx(p_r.value(), rel=1e-3)


def test_rational_fir_fuses():
    """BASELINE config #3 shape in a topology: a 3:2 rational resampler
    HEADS a fused segment (blocked-Toeplitz rational matmul core) with
    output parity vs the streaming polyphase path. (As an INTERIOR
    member a rational block engages only when its polyphase residue is
    zero — at the head the queue simply drains in granule multiples.)"""
    rng = np.random.default_rng(21)
    M, L, K_TAPS = 2, 3, 60
    taps = (rng.normal(size=K_TAPS) + 1j * rng.normal(size=K_TAPS)) / K_TAPS

    def mk():
        fir = BlockRegistry.make("/comms/fir_filter", "complex_float32",
                                 "COMPLEX")
        fir.set_taps(taps)
        fir.set_decimation(M)
        fir.set_interpolation(L)
        sc = BlockRegistry.make("/comms/scale", "complex_float32")
        sc.set_factor(1.25)
        return [fir, sc]

    feeds = [_cplx(rng, 4 * THRESH), _cplx(rng, 2 * THRESH + 64)]
    s_f, topo = _run(mk(), "complex_float32", "complex_float32", feeds,
                     True)
    assert sum(s.engage_count for s in topo._segments) >= 1, (
        "rational FIR segment never engaged")
    s_r, _ = _run(mk(), "complex_float32", "complex_float32", feeds,
                  False)
    a, b = s_f.get_buffer(), s_r.get_buffer()
    n = min(len(a), len(b))
    assert n > 0 and abs(len(a) - len(b)) < 2 * K_TAPS
    np.testing.assert_allclose(a[:n], b[:n], atol=1e-3)


def test_rational_fir_interior_engages_at_zero_residue():
    """An INTERIOR rational member engages when its polyphase residue
    (avail - (K-1)) mod M hits zero — odd-sized feeds align it for
    M=2, K=20 (K-1 odd)."""
    rng = np.random.default_rng(23)
    M, L, K_TAPS = 2, 3, 60
    taps = (rng.normal(size=K_TAPS) + 1j * rng.normal(size=K_TAPS)) / K_TAPS

    def mk():
        sc = BlockRegistry.make("/comms/scale", "complex_float32")
        sc.set_factor(0.75)
        fir = BlockRegistry.make("/comms/fir_filter", "complex_float32",
                                 "COMPLEX")
        fir.set_taps(taps)
        fir.set_decimation(M)
        fir.set_interpolation(L)
        return [sc, fir]

    feeds = [_cplx(rng, 4 * THRESH + 1), _cplx(rng, 2 * THRESH + 1)]
    s_f, topo = _run(mk(), "complex_float32", "complex_float32", feeds,
                     True)
    assert sum(s.engage_count for s in topo._segments) >= 1, (
        "interior rational FIR never engaged at zero residue")
    s_r, _ = _run(mk(), "complex_float32", "complex_float32", feeds,
                  False)
    a, b = s_f.get_buffer(), s_r.get_buffer()
    n = min(len(a), len(b))
    assert n > 0
    np.testing.assert_allclose(a[:n], b[:n], atol=1e-3)


def test_rational_fir_interior_engages_at_nonzero_residue():
    """Round 5: an INTERIOR rational member engages at ANY polyphase
    residue — the sub-M residue rides the carry (oldest-first) and
    stays constant across granule-aligned quanta. Even-sized feeds with
    K-1 odd leave residue 1 for M=2."""
    rng = np.random.default_rng(29)
    M, L, K_TAPS = 2, 3, 60
    taps = (rng.normal(size=K_TAPS) + 1j * rng.normal(size=K_TAPS)) / K_TAPS

    def mk():
        sc = BlockRegistry.make("/comms/scale", "complex_float32")
        sc.set_factor(0.75)
        fir = BlockRegistry.make("/comms/fir_filter", "complex_float32",
                                 "COMPLEX")
        fir.set_taps(taps)
        fir.set_decimation(M)
        fir.set_interpolation(L)
        return [sc, fir]

    # even totals: residue (avail - 59) mod 2 == 1 at engagement checks
    feeds = [_cplx(rng, 4 * THRESH), _cplx(rng, 2 * THRESH)]
    s_f, topo = _run(mk(), "complex_float32", "complex_float32", feeds,
                     True)
    assert sum(s.engage_count for s in topo._segments) >= 1, (
        "interior rational FIR never engaged at nonzero residue")
    assert sum(s.fused_elements for s in topo._segments) > 0
    s_r, _ = _run(mk(), "complex_float32", "complex_float32", feeds,
                  False)
    a, b = s_f.get_buffer(), s_r.get_buffer()
    n = min(len(a), len(b))
    assert n > 0 and abs(len(a) - len(b)) < 2 * K_TAPS
    np.testing.assert_allclose(a[:n], b[:n], atol=1e-3)
