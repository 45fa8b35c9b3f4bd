"""Round-5 fine-grained phases of the warm config-#1 run: where do the
0.33 s of a fully-warm 1 Mi-sample run go? Instruments seg.work, sink
work, and round count; also measures raw D2H fetch cost of the output.
"""
import json
import time

import numpy as np

from pothoscomms_tpu import BlockRegistry, Topology
from pothoscomms_tpu.core.block import Block
from pothoscomms_tpu.core.dtypes import DType


class TimedSink(Block):
    def __init__(self):
        super().__init__()
        self.dtype = DType.parse("float32")
        self.setup_input(0, self.dtype)
        self.input(0).set_capacity(None)
        self.t_material = 0.0
        self.count = 0
        self.parts = []

    def work(self):
        port = self.input(0)
        n = port.elements()
        if n == 0:
            return
        t0 = time.perf_counter()
        parts = port.take(n)
        arrs = [np.asarray(p) for p in parts]
        self.t_material += time.perf_counter() - t0
        self.count += n
        self.parts.extend(arrs)


def main():
    src = BlockRegistry.make("/comms/waveform_source", "float32")
    src.set_waveform("SINE")
    src.set_frequency(0.02)
    src.set_sample_rate(1.0)
    fir = BlockRegistry.make("/comms/fir_filter", "float32")
    rng = np.random.default_rng(5)
    fir.set_taps(rng.normal(size=51) / 51.0)
    sink = TimedSink()

    topo = Topology()
    topo.connect(src, 0, fir, 0)
    topo.connect(fir, 0, sink, 0)
    topo.commit()

    n = 1 << 20
    # two warm passes to populate every compile cache
    topo.run_source_elements(n)
    topo.run_source_elements(n)

    seg = topo._segments[0]
    t_segwork = [0.0]
    orig_work = seg.work

    def timed_work():
        t0 = time.perf_counter()
        orig_work()
        t_segwork[0] += time.perf_counter() - t0

    seg.work = timed_work
    sink.t_material = 0.0
    rounds = [0]
    orig_run = topo._run_once

    def counted_run():
        rounds[0] += 1
        return orig_run()

    topo._run_once = counted_run

    t0 = time.perf_counter()
    topo.run_source_elements(n)
    t_total = time.perf_counter() - t0

    # raw D2H: force-fetch a fresh [1Mi] f32 device array
    import jax.numpy as jnp
    x = jnp.arange(n, dtype=jnp.float32) * np.float32(1.000001)
    float(jnp.sum(x))
    t0 = time.perf_counter()
    a = np.asarray(x)
    t_fetch = time.perf_counter() - t0

    out = {
        "metric": "probe_r5_fir1ch_phases",
        "total_s": round(t_total, 3),
        "seg_work_s": round(t_segwork[0], 3),
        "sink_material_s": round(sink.t_material, 3),
        "rounds": rounds[0],
        "engage_count": seg.engage_count,
        "raw_d2h_1mi_s": round(t_fetch, 4),
        "msamp_s": round(n / t_total / 1e6, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
