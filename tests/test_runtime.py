"""Core runtime tests: ports, labels, messages, signals/slots, fixtures.

Mirrors the framework-level behaviors the reference relies on from Pothos
core (SURVEY.md §1: labels, reserve, signals/slots, probes).
"""

import numpy as np
import pytest

from pothoscomms_tpu import Block, BlockRegistry, Label, Topology
from pothoscomms_tpu.core.fixtures import CollectorSink, Copier, FeederSource


def test_feeder_to_collector_buffers_and_labels():
    feeder = FeederSource("float32")
    collector = CollectorSink("float32")
    topo = Topology()
    topo.connect(feeder, 0, collector, 0)

    a = np.arange(10, dtype=np.float32)
    b = np.arange(10, 20, dtype=np.float32)
    feeder.feed_buffer(a, [Label("start", None, 0)])
    feeder.feed_buffer(b, [Label("mid", 42, 3)])
    assert topo.wait_inactive()

    np.testing.assert_array_equal(collector.get_buffer(), np.concatenate([a, b]))
    labels = collector.get_labels()
    assert [(l.id, l.index) for l in labels] == [("start", 0), ("mid", 13)]
    assert labels[1].data == 42


def test_copier_rechunks_but_preserves_stream_and_labels():
    feeder = FeederSource("int32")
    copier = Copier(seed=123)
    collector = CollectorSink("int32")
    topo = Topology()
    topo.connect(feeder, 0, copier, 0)
    topo.connect(copier, 0, collector, 0)

    data = np.arange(1000, dtype=np.int32)
    feeder.feed_buffer(data[:400], [Label("L0", None, 5)])
    feeder.feed_buffer(data[400:], [Label("L1", None, 100)])
    assert topo.wait_inactive()

    np.testing.assert_array_equal(collector.get_buffer(), data)
    labels = {l.id: l.index for l in collector.get_labels()}
    assert labels == {"L0": 5, "L1": 500}


def test_signal_slot_wiring():
    class Designer(Block):
        def __init__(self):
            super().__init__()
            self.register_signal("tapsChanged")

        def set_num_taps(self, n):
            self.emit_signal("tapsChanged", list(range(n)))

    class Filter(Block):
        def __init__(self):
            super().__init__()
            self.taps = None

        def set_taps(self, taps):
            self.taps = taps

    d, f = Designer(), Filter()
    topo = Topology()
    topo.connect(d, "tapsChanged", f, "setTaps")
    d.call("setNumTaps", 5)
    assert f.taps == [0, 1, 2, 3, 4]


def test_probe_emits_triggered_signal():
    class Probed(Block):
        def __init__(self):
            super().__init__()
            self.register_probe("value")
            self._v = 7

        def value(self):
            return self._v

    class Sink(Block):
        def __init__(self):
            super().__init__()
            self.seen = []

        def got(self, v):
            self.seen.append(v)

    p, s = Probed(), Sink()
    p.connect_signal("valueTriggered", s, "got")
    assert p.probe("value") == 7
    assert s.seen == [7]


def test_registry_make_and_paths():
    blk = BlockRegistry.make("/comms/arithmetic", "float32", "ADD")
    assert blk is not None
    assert BlockRegistry.exists("/blocks/arithmetic")
    with pytest.raises(KeyError):
        BlockRegistry.make("/comms/nonexistent")


def test_feed_test_plan_roundtrip():
    feeder = FeederSource("float64")
    collector = CollectorSink("float64")
    topo = Topology()
    topo.connect(feeder, 0, collector, 0)
    expected = feeder.feed_test_plan(
        {"seed": 7, "minBuffers": 3, "maxBuffers": 6}
    )["expected"]
    assert topo.wait_inactive()
    np.testing.assert_array_equal(collector.get_buffer(), expected)
