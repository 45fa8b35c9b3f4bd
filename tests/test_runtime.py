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


def test_bounded_backpressure_gates_producer():
    """A fast producer ahead of a slow consumer must not grow the edge
    queue beyond its capacity (the reference bounds every edge with a
    buffer manager, SURVEY.md §1). The producer is skipped by the
    scheduler while the downstream queue is at capacity."""

    class SlowSink(Block):
        def __init__(self):
            super().__init__()
            self.setup_input(0, "float32")
            self.got = 0

        def work(self):
            port = self.input(0)
            n = min(port.elements(), 100)  # drains slowly
            port.consume(n)
            self.got += n

    feeder = FeederSource("float32")
    scale = BlockRegistry.make("/comms/scale", "float32")
    sink = SlowSink()
    sink.input(0).set_capacity(256)

    total = 50_000
    for _ in range(50):
        feeder.feed_buffer(np.ones(total // 50, np.float32))

    topo = Topology()
    topo.connect(feeder, 0, scale, 0)
    topo.connect(scale, 0, sink, 0)
    topo.commit()

    max_queue = 0
    for _ in range(10_000):
        if not topo._run_once():
            break
        max_queue = max(max_queue, sink.input(0).elements())
    assert sink.got == total
    # volume-aware producers clamp their post to downstream free space,
    # so the queue never exceeds the capacity
    assert max_queue <= 256, max_queue


def test_backpressure_message_queue_bound():
    """Message edges are bounded too: a packet flood is gated."""
    from pothoscomms_tpu.core.packet import Packet

    class PacketSource(Block):
        def __init__(self, count):
            super().__init__()
            self.setup_output(0)
            self.left = count

        def wants_work(self):
            return self.left > 0

        def work(self):
            if self.left > 0:
                self.output(0).post_message(Packet(np.zeros(8, np.uint8)))
                self.left -= 1

    class SlowPacketSink(Block):
        def __init__(self):
            super().__init__()
            self.setup_input(0)
            self.got = 0

        def work(self):
            if self.input(0).has_message():
                self.input(0).pop_message()
                self.got += 1

    src = PacketSource(500)
    sink = SlowPacketSink()
    sink.input(0).set_capacity(None, messages=16)
    topo = Topology()
    topo.connect(src, 0, sink, 0)
    topo.commit()
    max_q = 0
    for _ in range(5000):
        if not topo._run_once():
            break
        max_q = max(max_q, len(sink.input(0)._messages))
    assert sink.got == 500
    assert max_q <= 17, max_q


def test_input_queue_amortized_copies():
    """VERDICT r3 #8: repeated buffer()/consume() cycles over a stream of
    small parts must cost amortized O(1) copies per element, not
    re-concatenate the whole queue each work call."""
    from pothoscomms_tpu.core.block import Block, InputPort

    blk = Block("probe")
    port = blk.setup_input(0, "float32")
    part = np.arange(256, dtype=np.float32)
    total = 0
    # steady-state streaming: push a small part, peek, consume half —
    # the queue depth stays bounded while data flows through
    for i in range(2000):
        port.push_buffer(part + i)
        total += 256
        buf = port.buffer()
        port.consume(128)
    # legacy behavior re-copied the whole queue per cycle:
    # sum_{i} (queue depth ~ 128*i) = O(n^2) ~ 2000*128*2000/2 >> 10x
    assert port.copied_elements < 8 * total, (
        f"copied {port.copied_elements} for {total} streamed elements")
    # correctness: FIFO content preserved (2000*128 consumed = exactly
    # the first 1000 pushed parts)
    got = port.buffer()
    assert got.shape[0] == port.elements() == total - 2000 * 128
    np.testing.assert_array_equal(got[:256], part + 1000)
