"""Round-4 verify drive: fused FIR->FFT segment feeding a LEGACY jitted
block (Scale) on the real chip — the ADVICE r3 high-severity shape —
plus a fused-vs-streaming parity check. One TPU process, small shapes.
"""
import json
import numpy as np

from pothoscomms_tpu import BlockRegistry, Topology
from pothoscomms_tpu.core.fixtures import CollectorSink, FeederSource

THRESH = 4096


def run(fuse: bool, feeds):
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
    topo.fuse_threshold = THRESH
    chain = [feed, fir, fft, scale, sink]
    for a, b in zip(chain[:-1], chain[1:]):
        topo.connect(a, 0, b, 0)
    for f in feeds:
        feed.feed_buffer(f)
    topo.commit()
    ok = topo.wait_inactive(timeout=600.0)
    engaged = sum(s.engage_count for s in topo._segments)
    return sink.get_buffer(), ok, engaged


def main():
    rng = np.random.default_rng(0)
    feeds = [
        (rng.normal(size=3 * THRESH) + 1j * rng.normal(size=3 * THRESH)
         ).astype(np.complex64),
        (rng.normal(size=2 * THRESH + 511)
         + 1j * rng.normal(size=2 * THRESH + 511)).astype(np.complex64),
    ]
    a, ok1, eng = run(True, feeds)
    b, ok2, _ = run(False, feeds)
    err = float(np.max(np.abs(a - b))) if a.shape == b.shape else float("inf")
    print(json.dumps({
        "ok": bool(ok1 and ok2), "engaged": eng,
        "shape_match": a.shape == b.shape, "max_abs_err": err,
        "pass": bool(ok1 and ok2 and eng >= 1 and a.shape == b.shape
                     and err < 2e-2),
    }))


if __name__ == "__main__":
    main()
