"""Instrument the topology bench per phase on the chip: wall time of
segment pull / step dispatch / post, sink work, feeder work, and each
scheduling round — to find where the 12 s/quantum goes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benches/probe_topo_phases.py
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from pothoscomms_tpu import BlockRegistry, Topology
from pothoscomms_tpu.core.fixtures import FeederSource
from pothoscomms_tpu.core.block import Block
from pothoscomms_tpu.core.dtypes import DType
from pothoscomms_tpu.core.fusion import DeviceChunk, FusedSegment

K, NBINS, CHUNK = 64, 1024, 1 << 25
rng = np.random.default_rng(0)
taps = (rng.normal(size=K) + 1j * rng.normal(size=K)) / K


class NullSink(Block):
    def __init__(self, dtype):
        super().__init__()
        self.dtype = DType.parse(dtype)
        self.setup_input(0, self.dtype)
        self.chunks = []

    def work(self):
        port = self.input(0)
        n = port.elements()
        if n:
            t0 = time.perf_counter()
            self.chunks.extend(port.take(n))
            print(json.dumps({"phase": "sink_take",
                              "ms": round((time.perf_counter() - t0) * 1e3,
                                          1)}), flush=True)


# patch FusedSegment.work with phase timing
orig_work = FusedSegment.work


def timed_work(self):
    if not self.engaged:
        return
    port = self.head
    if port._messages or self._epoch_sig() != self._epochs:
        self.disengage()
        return
    avail = port.elements()
    limit = self._head_label_limit()
    if limit is not None:
        avail = min(avail, limit)
    free = self.tail_out.free_space()
    cap = avail if free is None else min(avail, max(free, 0))
    q = self._bucket(cap)
    if q == 0:
        if limit is not None:
            self.disengage()
        return
    t0 = time.perf_counter()
    x = self._pull(q)
    t1 = time.perf_counter()
    y, self.carries = self.step(x, self.carries, self.params)
    t2 = time.perf_counter()
    self.tail_out.post(DeviceChunk(y, self.tail_dtype))
    t3 = time.perf_counter()
    self.fused_elements += q
    print(json.dumps({"phase": "seg", "q": q,
                      "pull_ms": round((t1 - t0) * 1e3, 1),
                      "step_ms": round((t2 - t1) * 1e3, 1),
                      "post_ms": round((t3 - t2) * 1e3, 1)}), flush=True)


FusedSegment.work = timed_work

fir = BlockRegistry.make("/comms/fir_filter", "complex_float32", "COMPLEX")
fir.set_taps(taps)
fft = BlockRegistry.make("/comms/fft", "complex_float32", NBINS, False)
feed = FeederSource("complex_float32")
sink = NullSink("complex_float32")
topo = Topology()
topo.connect(feed, 0, fir, 0)
topo.connect(fir, 0, fft, 0)
topo.connect(fft, 0, sink, 0)
fir.input(0).set_capacity(CHUNK * 4)
fft.input(0).set_capacity(CHUNK * 2)
sink.input(0).set_capacity(CHUNK * 2)
topo.commit()


def stage():
    arr = rng.normal(size=(CHUNK, 2)).astype(np.float32) * 0.05
    x = jnp.asarray(arr)
    _ = float(jnp.sum(x))
    return DeviceChunk(x, "complex_float32")


print("staging...", flush=True)
chunks = [stage() for _ in range(3)]
print("staged", flush=True)

for i, ch in enumerate(chunks):
    t0 = time.perf_counter()
    feed.feed_buffer(ch)
    ok = topo.wait_inactive(timeout=1800.0)
    t1 = time.perf_counter()
    print(json.dumps({"phase": "iteration", "i": i, "ok": ok,
                      "s": round(t1 - t0, 2)}), flush=True)

# force everything at the end (drain remainders arrive as numpy)
t0 = time.perf_counter()
tot = 0.0
for c in sink.chunks:
    tot += float(jnp.sum(c.planar)) if isinstance(c, DeviceChunk) \
        else float(np.sum(np.asarray(c).view(np.float32)))
print(json.dumps({"phase": "final_force", "s": round(
    time.perf_counter() - t0, 2), "checksum_finite": bool(np.isfinite(tot))}),
    flush=True)
