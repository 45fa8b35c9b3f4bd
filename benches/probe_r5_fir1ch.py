"""Round-5 diagnosis: why does BASELINE config #1 (waveform -> FIR, 1
channel, 1 Mi samples) commit 0.03 Msamp/s?

Phases measured separately: topology build+commit, cold first quota run
(includes every remote compile), warm second run on the SAME topology
(steady state), and segment engagement counters.
"""
import json
import time

import numpy as np

from pothoscomms_tpu import BlockRegistry, Topology
from pothoscomms_tpu.core.fixtures import CollectorSink


def main():
    t0 = time.perf_counter()
    src = BlockRegistry.make("/comms/waveform_source", "float32")
    src.set_waveform("SINE")
    src.set_frequency(0.02)
    src.set_sample_rate(1.0)
    fir = BlockRegistry.make("/comms/fir_filter", "float32")
    rng = np.random.default_rng(5)
    taps = rng.normal(size=51) / 51.0
    fir.set_taps(taps)
    sink = CollectorSink("float32")
    sink.input(0).set_capacity(None)

    topo = Topology()
    topo.connect(src, 0, fir, 0)
    topo.connect(fir, 0, sink, 0)
    topo.commit()
    t_build = time.perf_counter() - t0

    n = 1 << 20
    t0 = time.perf_counter()
    topo.run_source_elements(n)
    t_cold = time.perf_counter() - t0

    t0 = time.perf_counter()
    topo.run_source_elements(n)
    t_warm = time.perf_counter() - t0

    t0 = time.perf_counter()
    topo.run_source_elements(n)
    t_warm2 = time.perf_counter() - t0

    seg = topo._segments[0] if topo._segments else None
    stats = {b.name: {"calls": b._work_calls,
                      "time_s": round(b._work_time, 3)}
             for b in topo.blocks}
    out = {
        "metric": "probe_r5_fir1ch",
        "build_s": round(t_build, 3),
        "cold_s": round(t_cold, 3),
        "warm_s": round(t_warm, 3),
        "warm2_s": round(t_warm2, 3),
        "cold_msamp_s": round(n / t_cold / 1e6, 3),
        "warm_msamp_s": round(n / t_warm / 1e6, 3),
        "warm2_msamp_s": round(n / t_warm2 / 1e6, 3),
        "segments": len(topo._segments),
        "engage_count": seg.engage_count if seg else 0,
        "fused_elements": seg.fused_elements if seg else 0,
        "collected": len(sink.get_buffer()),
        "block_stats": stats,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
