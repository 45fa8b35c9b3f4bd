"""Backpressure soak: a fast source driving a slow consumer for a long
run must keep every edge queue bounded by its capacity (the flat-RSS
property of bounded buffer managers — SURVEY.md §1 "Buffer managers").
"""

import numpy as np

from pothoscomms_tpu import BlockRegistry, Topology
from pothoscomms_tpu.core.block import DEFAULT_EDGE_CAPACITY_BYTES
from pothoscomms_tpu.core.fixtures import CollectorSink


class _SlowSink(CollectorSink):
    """Consumes in small bites to force upstream backlog."""

    def __init__(self, dtype, bite=256):
        super().__init__(dtype)
        self._bite = bite

    def work(self):
        port = self.input(0)
        # mid-stream high-water mark: sampled on every scheduler visit,
        # while upstream is actively producing
        depth = port.elements()
        self.high_water = max(getattr(self, "high_water", 0), depth)
        if port.capacity is not None:
            assert depth <= port.capacity, (
                f"queue over capacity mid-stream: {depth}")
        n = min(depth, self._bite)
        if n == 0:
            return
        # keep only a rolling checksum — the soak must not accumulate
        buf = np.asarray(port.buffer(n))
        self._checksum = float(buf.sum()) + getattr(self, "_checksum", 0.0)
        port.consume(n)


def test_fm_chain_soak_bounded_queues():
    src = BlockRegistry.make("/comms/waveform_source", "complex_float32")
    src.set_waveform("SINE")
    src.set_frequency(0.013)
    src.set_sample_rate(1.0)
    demod = BlockRegistry.make("/comms/freq_demod", "complex_float32")
    dc = BlockRegistry.make("/comms/dc_removal", "float32")
    dc.set_average_size(32)
    dc.set_cascade_size(2)
    env = BlockRegistry.make("/comms/envelope_detector", "float32")
    sink = _SlowSink("float32")

    topo = Topology()
    topo.connect(src, 0, demod, 0)
    topo.connect(demod, 0, dc, 0)
    topo.connect(dc, 0, env, 0)
    topo.connect(env, 0, sink, 0)
    topo.commit()

    ports = [blk.input(0) for blk in (demod, dc, env, sink)]
    high_water = 0
    high_water_bytes = 0
    total = 1 << 21
    chunk = 1 << 16
    fed = 0
    while fed < total:
        topo.run_source_elements(chunk)
        assert topo.wait_inactive(timeout=60.0)
        fed += chunk
        for p in ports:
            high_water = max(high_water, p.elements())
            high_water_bytes = max(high_water_bytes,
                                   p.elements() * p.dtype.itemsize)
            cap = p.capacity
            assert cap is None or p.elements() <= cap, (
                f"queue over capacity: {p.elements()} > {cap}")
    # queues drained at quiescence and never exceeded the dtype-scaled
    # BYTE bound (the reference's slab-sized buffer managers), including
    # the mid-stream samples taken inside the slow consumer
    assert high_water_bytes <= DEFAULT_EDGE_CAPACITY_BYTES
    assert sink.high_water * sink.input(0).dtype.itemsize \
        <= DEFAULT_EDGE_CAPACITY_BYTES
    assert sink.high_water > 0
    assert sink._checksum is not None
