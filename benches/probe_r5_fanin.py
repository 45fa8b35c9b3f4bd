"""Round-5 fan-in chip artifact: feeder x2 -> Arithmetic(ADD, complex)
-> FFT engages as ONE fused segment with two head ports; throughput of
the warm fused path on the chip (VERDICT r4 #3 'chip number committed').
"""
import json
import time

import numpy as np

from pothoscomms_tpu import BlockRegistry, Topology
from pothoscomms_tpu.core.block import Block
from pothoscomms_tpu.core.dtypes import DType
from pothoscomms_tpu.core.fixtures import FeederSource


class DrainSink(Block):
    def __init__(self, dtype):
        super().__init__()
        self.dtype = DType.parse(dtype)
        self.setup_input(0, self.dtype)
        self.input(0).set_capacity(None)
        self.last = None

    def work(self):
        port = self.input(0)
        n = port.elements()
        if n:
            self.last = port.take(n)[-1]


def main():
    rng = np.random.default_rng(0)
    NB = 1024
    f1 = FeederSource("complex_float32")
    f2 = FeederSource("complex_float32")
    ar = BlockRegistry.make("/comms/arithmetic", "complex_float32", "ADD")
    fft = BlockRegistry.make("/comms/fft", "complex_float32", NB, False)
    sink = DrainSink("complex_float32")
    topo = Topology()
    topo.connect(f1, 0, ar, 0)
    topo.connect(f2, 0, ar, 1)
    topo.connect(ar, 0, fft, 0)
    topo.connect(fft, 0, sink, 0)
    topo.commit()

    n = 1 << 22
    mk = lambda: (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(
        np.complex64)
    for _ in range(2):  # warm the ladder; sync deferred compiles
        f1.feed_buffer(mk())
        f2.feed_buffer(mk())
        topo.wait_inactive(timeout=120.0)
        if sink.last is not None:
            float(np.abs(np.asarray(sink.last[-1:])).sum())

    a, b = mk(), mk()
    t0 = time.perf_counter()
    f1.feed_buffer(a)
    f2.feed_buffer(b)
    ok = topo.wait_inactive(timeout=120.0)
    if sink.last is not None:
        float(np.abs(np.asarray(sink.last[-1:])).sum())
    dt = time.perf_counter() - t0

    seg = topo._segments[0]
    out = {"metric": "fanin_arith_fft", "value": round(n / dt / 1e6, 1),
           "unit": "Msamples/s", "heads": len(seg.heads),
           "seg_blocks": len(seg.blocks),
           "fused_elements": seg.fused_elements,
           "engage_count": seg.engage_count, "quiesced": bool(ok)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
