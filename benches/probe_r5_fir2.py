"""Trace every round of the warm config-#1 run: which blocks stream,
when the segment engages/works/disengages, and what each phase costs.
"""
import json
import time

import numpy as np

from pothoscomms_tpu import BlockRegistry, Topology
from pothoscomms_tpu.core.block import Block
from pothoscomms_tpu.core.dtypes import DType


class KeepSink(Block):
    def __init__(self):
        super().__init__()
        self.dtype = DType.parse("float32")
        self.setup_input(0, self.dtype)
        self.input(0).set_capacity(None)
        self.parts = []

    def work(self):
        port = self.input(0)
        n = port.elements()
        if n:
            self.parts.extend(port.take(n))


def main():
    src = BlockRegistry.make("/comms/waveform_source", "float32")
    src.set_waveform("SINE")
    src.set_frequency(0.02)
    src.set_sample_rate(1.0)
    fir = BlockRegistry.make("/comms/fir_filter", "float32")
    rng = np.random.default_rng(5)
    fir.set_taps(rng.normal(size=51) / 51.0)
    sink = KeepSink()
    topo = Topology()
    topo.connect(src, 0, fir, 0)
    topo.connect(fir, 0, sink, 0)
    topo.commit()

    n = 1 << 20
    topo.run_source_elements(n)
    topo.run_source_elements(n)
    sink.parts.clear()

    seg = topo._segments[0]
    log = []

    def wrap(obj, name, tag):
        orig = getattr(obj, name)

        def inner(*a, **k):
            t0 = time.perf_counter()
            r = orig(*a, **k)
            log.append((tag, round((time.perf_counter() - t0) * 1e3, 2),
                        round(t0 * 1e3) % 1000000))
            return r

        setattr(obj, name, inner)

    wrap(seg, "work", "seg.work")
    wrap(seg, "try_engage", "seg.engage")
    wrap(seg, "disengage", "seg.disengage")
    wrap(src, "work", "src.stream")
    wrap(fir, "work", "fir.stream")
    wrap(sink, "work", "sink")

    t0 = time.perf_counter()
    topo.run_source_elements(n)
    if sink.parts:
        float(np.asarray(sink.parts[-1][-1:])[0])
    dt = time.perf_counter() - t0
    print(json.dumps({"total_ms": round(dt * 1e3, 1),
                      "events": log[:80],
                      "n_events": len(log),
                      "engaged_now": seg.engaged,
                      "engage_count": seg.engage_count}))


if __name__ == "__main__":
    main()
