"""Regression tests for the round-3 advisor findings (ADVICE.md r3).

Each test pins one fixed defect:
1. (high) DeviceChunk reaching a legacy jitted block via buffer()
2. (med) SignalProbe device-reduction jit cache must actually hit
3. (med) load_state must disengage fused segments like save_state
4. (low) FIR fuse_import must restore by the carry's own length
5. (low) fused segment must not disengage on pure downstream congestion
"""

import numpy as np

from pothoscomms_tpu import BlockRegistry, Topology
from pothoscomms_tpu.core.fixtures import CollectorSink, FeederSource
from pothoscomms_tpu.core.fusion import DeviceChunk
from pothoscomms_tpu.core.labels import Label

THRESH = 4096


def _cplx(rng, n):
    return (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)


def _fir_fft_scale_chain(fuse: bool, feeds, threshold=THRESH):
    rng = np.random.default_rng(7)
    k, nb = 17, 256
    taps = (rng.normal(size=k) + 1j * rng.normal(size=k)) / k
    fir = BlockRegistry.make("/comms/fir_filter", "complex_float32", "COMPLEX")
    fir.set_taps(taps)
    fft = BlockRegistry.make("/comms/fft", "complex_float32", nb, False)
    scale = BlockRegistry.make("/comms/scale", "complex_float32")
    scale.set_factor(0.5)
    feed = FeederSource("complex_float32")
    sink = CollectorSink("complex_float32")
    topo = Topology()
    topo.auto_fuse = fuse
    topo.fuse_threshold = threshold
    chain = [feed, fir, fft, scale, sink]
    for a, b in zip(chain[:-1], chain[1:]):
        topo.connect(a, 0, b, 0)
    for f in feeds:
        feed.feed_buffer(f)
    topo.commit()
    assert topo.wait_inactive(timeout=30.0)
    return sink, topo


def test_devicechunk_into_legacy_jit_block():
    """A legacy jit block (Scale) directly downstream of a fused segment
    must materialize DeviceChunks via buffer() instead of crashing."""
    rng = np.random.default_rng(0)
    feeds = [_cplx(rng, 3 * THRESH), _cplx(rng, 2 * THRESH + 511)]
    s_fused, topo = _fir_fft_scale_chain(True, feeds)
    assert sum(s.engage_count for s in topo._segments) >= 1
    s_ref, _ = _fir_fft_scale_chain(False, feeds)
    a, b = s_fused.get_buffer(), s_ref.get_buffer()
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=2e-2)


def test_probe_reduce_fn_cache_hits():
    from pothoscomms_tpu.blocks.utility import _probe_reduce_fn

    assert _probe_reduce_fn("RMS", True) is _probe_reduce_fn("RMS", True)
    assert _probe_reduce_fn("MEAN", False) is _probe_reduce_fn("MEAN", False)


def test_load_state_disengages_segments(tmp_path):
    """Restoring a checkpoint into a topology with an ENGAGED segment
    must not corrupt the restored stream with stale device carries."""
    rng = np.random.default_rng(3)
    k, nb = 17, 256
    taps = (rng.normal(size=k) + 1j * rng.normal(size=k)) / k

    def mk():
        fir = BlockRegistry.make("/comms/fir_filter", "complex_float32",
                                 "COMPLEX")
        fir.set_taps(taps)
        fft = BlockRegistry.make("/comms/fft", "complex_float32", nb, False)
        feed = FeederSource("complex_float32")
        sink = CollectorSink("complex_float32")
        topo = Topology()
        topo.fuse_threshold = THRESH
        for a, b in zip([feed, fir, fft, sink][:-1], [feed, fir, fft, sink][1:]):
            topo.connect(a, 0, b, 0)
        return topo, feed, sink

    x1 = _cplx(rng, 2 * THRESH)
    x2 = _cplx(rng, 2 * THRESH)

    # reference: run x1 then x2 straight through (no checkpoint)
    topo_r, feed_r, sink_r = mk()
    feed_r.feed_buffer(x1)
    topo_r.commit()
    assert topo_r.wait_inactive(timeout=30.0)
    feed_r.feed_buffer(x2)
    assert topo_r.wait_inactive(timeout=30.0)
    ref = sink_r.get_buffer()

    # checkpoint after x1 (segment stays engaged at empty-head
    # quiescence), then immediately restore INTO the engaged topology
    topo, feed, sink = mk()
    feed.feed_buffer(x1)
    topo.commit()
    assert topo.wait_inactive(timeout=30.0)
    path = str(tmp_path / "ckpt.npz")
    topo.save_state(path)
    # re-engage so load_state sees an engaged segment
    feed.feed_buffer(x2[:THRESH])
    topo._run_once()
    topo.load_state(path)
    feed.feed_buffer(x2)
    assert topo.wait_inactive(timeout=30.0)
    got = sink.get_buffer()
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-2)


def test_fir_fuse_import_after_retap():
    """set_taps to a shorter filter while engaged must not drop the old
    K-1 history on import (it is stream data, not config)."""
    rng = np.random.default_rng(5)
    k = 9
    taps = (rng.normal(size=k) + 1j * rng.normal(size=k)) / k
    fir = BlockRegistry.make("/comms/fir_filter", "complex_float32",
                             "COMPLEX")
    fir.set_taps(taps)
    x = _cplx(rng, 64)
    fir.input(0).push_buffer(x)
    carry, _ = fir.fuse_export(1)
    assert fir.input(0).elements() == 64 - (k - 1)
    fir.set_taps(np.array([1.0 + 0j]))  # K becomes 1 while engaged
    fir.fuse_import(carry)
    assert fir.input(0).elements() == 64, "old history samples lost"
    np.testing.assert_allclose(
        np.asarray(fir.input(0).buffer()), x, atol=1e-6)


def test_no_disengage_on_pure_congestion():
    """q == 0 from downstream congestion (free_space 0) with a far-away
    label must NOT stash/disengage — only labels that actually bound the
    pull may."""
    rng = np.random.default_rng(6)
    k, nb = 17, 256
    taps = (rng.normal(size=k) + 1j * rng.normal(size=k)) / k
    fir = BlockRegistry.make("/comms/fir_filter", "complex_float32",
                             "COMPLEX")
    fir.set_taps(taps)
    fft = BlockRegistry.make("/comms/fft", "complex_float32", nb, False)
    feed = FeederSource("complex_float32")
    sink = CollectorSink("complex_float32")
    topo = Topology()
    topo.fuse_threshold = THRESH
    for a, b in zip([feed, fir, fft, sink][:-1], [feed, fir, fft, sink][1:]):
        topo.connect(a, 0, b, 0)
    topo.commit()
    # label far beyond any single quantum, then congest the sink edge
    big = 4 * THRESH
    feed.feed_buffer(_cplx(rng, big),
                     [Label("marker", 1, big - 1)])
    seg = topo._segments[0]
    sink.input(0).set_capacity(0)  # no free space downstream
    topo._run_once()
    assert seg.engaged, "segment disengaged under pure congestion"
    assert seg.stash is None
    # un-congest: the backlog drains fused, label region streams
    sink.input(0).set_capacity(None)
    assert topo.wait_inactive(timeout=30.0)
    assert sink.get_buffer().size > 0
