"""Round-4 chip drive: source-headed fused segments on the real TPU.

1. waveform -> scale -> rotate (exact parity vs streaming)
2. noise(fast) -> freq_demod -> dc_removal -> envelope (BASELINE config
   #4 shape; statistical parity)
"""
import json
import numpy as np

from pothoscomms_tpu import BlockRegistry, Topology
from pothoscomms_tpu.core.fixtures import CollectorSink

THRESH = 4096


def run_source(src, blocks, dtype_out, n, fuse):
    sink = CollectorSink(dtype_out)
    topo = Topology()
    topo.auto_fuse = fuse
    topo.fuse_threshold = THRESH
    chain = [src] + blocks + [sink]
    for a, b in zip(chain[:-1], chain[1:]):
        topo.connect(a, 0, b, 0)
    topo.commit()
    topo.run_source_elements(n)
    seg = topo._segments[0] if topo._segments else None
    return sink.get_buffer(), seg


def wave_chain():
    src = BlockRegistry.make("/comms/waveform_source", "complex_float32")
    src.set_waveform("SINE")
    src.set_frequency(1000.0)
    src.set_sample_rate(48000.0)
    sc = BlockRegistry.make("/comms/scale", "complex_float32")
    sc.set_factor(0.5)
    rot = BlockRegistry.make("/comms/rotate", "complex_float32")
    rot.set_phase(0.2)
    return src, [sc, rot]


def fm_chain(seed):
    src = BlockRegistry.make("/comms/noise_source", "complex_float32", seed)
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


def main():
    out = {}
    n = 6 * THRESH
    src, blocks = wave_chain()
    a, seg = run_source(src, blocks, "complex_float32", n, True)
    src2, blocks2 = wave_chain()
    b, _ = run_source(src2, blocks2, "complex_float32", n, False)
    out["wave_engaged"] = seg.engage_count if seg else 0
    out["wave_err"] = float(np.max(np.abs(a - b)))

    src, blocks = fm_chain(11)
    a, seg = run_source(src, blocks, "float32", n, True)
    src2, blocks2 = fm_chain(11)
    b, _ = run_source(src2, blocks2, "float32", n, False)
    out["fm_engaged"] = seg.engage_count if seg else 0
    out["fm_seg_blocks"] = len(seg.blocks) if seg else 0
    out["fm_rms_fused"] = float(np.sqrt(np.mean(a * a)))
    out["fm_rms_stream"] = float(np.sqrt(np.mean(b * b)))
    out["pass"] = bool(
        out["wave_engaged"] >= 1 and out["wave_err"] < 1e-4
        and out["fm_engaged"] >= 1 and out["fm_seg_blocks"] == 4
        and abs(out["fm_rms_fused"] / out["fm_rms_stream"] - 1) < 0.05)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
