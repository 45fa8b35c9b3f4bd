"""North-star chain THROUGH THE BLOCK API: feeder -> /comms/fir_filter
-> /comms/fft -> sink, executed by the Topology scheduler with
auto-fusion (core/fusion.py). Acceptance (round-2 verdict #1): within
~20% of bench.py's hand-fused number on the chip.

Measurement discipline mirrors bench.py (see .claude/skills/verify):
fresh pre-staged device inputs (DeviceChunks, like bench.py's pool —
the H2D staging is outside the timed loop in both), a device-side
running checksum accumulated per quantum, forced ONCE after the timed
loop. The checksum depends on every posted spectra chunk, so all timed
work is transitively materialized.

Prints one JSON line {"metric": "fir_fft_topology_throughput", ...}.
"""

import json
import sys
import time

import numpy as np


class DeviceChecksumSink:
    pass  # placeholder for import order; real class below


def main():
    import jax
    import jax.numpy as jnp

    from pothoscomms_tpu import BlockRegistry, Topology
    from pothoscomms_tpu.core.block import Block
    from pothoscomms_tpu.core.fixtures import FeederSource
    from pothoscomms_tpu.core.fusion import DeviceChunk, to_planar_jax

    class ChecksumSink(Block):
        """Collects device chunks without touching them (CollectorSink
        discipline); checksum() reduces them all in one pass — the
        single forced fetch that materializes the whole pipeline,
        called inside the timed region (same sync discipline as
        bench.py's final jnp.sum)."""

        def __init__(self, dtype):
            super().__init__()
            from pothoscomms_tpu.core.dtypes import DType

            self.dtype = DType.parse(dtype)
            self.setup_input(0, self.dtype)
            self._chunks = []
            self._count = 0
            self._sum = jax.jit(jnp.sum)

        def work(self):
            port = self.input(0)
            n = port.elements()
            if n == 0:
                return
            self._chunks.extend(port.take(n))
            self._count += n

        def checksum(self):
            # timing barrier identical to bench.py's: force the LAST
            # result — device execution is in-order, so its value
            # waits on every step dispatched before it
            if not self._chunks:
                return 0.0
            last = self._chunks[-1]
            self._chunks.clear()
            return float(self._sum(to_planar_jax(last, self.dtype)))

    import os

    K, NBINS = 64, 1024
    CHUNK = 1 << 25          # elements per fed chunk (2x MAX_QUANTUM:
    CHUNKS_PER_ITER = 4      # each device call carries ~5-7 ms fixed
    ITERS = 2                # relay overhead, so quanta must be large)
    if os.environ.get("BENCH_SMALL"):  # CPU smoke test of the harness
        CHUNK, CHUNKS_PER_ITER, ITERS = 1 << 16, 2, 2
    rng = np.random.default_rng(0)
    taps = (rng.normal(size=K) + 1j * rng.normal(size=K)) / K

    fir = BlockRegistry.make("/comms/fir_filter", "complex_float32",
                             "COMPLEX")
    fir.set_taps(taps)
    fft = BlockRegistry.make("/comms/fft", "complex_float32", NBINS, False)
    feed = FeederSource("complex_float32")
    sink = ChecksumSink("complex_float32")

    topo = Topology()
    topo.connect(feed, 0, fir, 0)
    topo.connect(fir, 0, fft, 0)
    topo.connect(fft, 0, sink, 0)
    # edge sizing for the high-rate lane (the reference tunes buffer
    # managers per-port the same way, fft/FFT.cpp:54-59)
    fir.input(0).set_capacity(CHUNK * (CHUNKS_PER_ITER + 1))
    fft.input(0).set_capacity(CHUNK * 2)
    sink.input(0).set_capacity(CHUNK * 2)
    topo.commit()

    def stage_chunk(seed):
        arr = rng.normal(size=(CHUNK, 2)).astype(np.float32) * 0.05
        x = jnp.asarray(arr)
        _ = float(jnp.sum(x))  # materialize before timing
        return DeviceChunk(x, "complex_float32")

    def run_pass(chunks):
        """One full pass: feed, run to quiescence, force the checksum.
        Warmup and timed passes are IDENTICAL so every program the
        timed passes dispatch (fused steps at each ladder rung, pull
        slice/concat kernels, checksum sums) is compiled in warmup."""
        for ch in chunks:
            feed.feed_buffer(ch)
        assert topo.wait_inactive(timeout=1800.0)
        return sink.checksum()

    # pre-stage all inputs (same as bench.py's pool; fresh data per
    # pass — the relay memoizes identical executions)
    pools = [[stage_chunk(i * 100 + j) for j in range(CHUNKS_PER_ITER)]
             for i in range(ITERS + 1)]

    # K-1 primer: the first engage consumes the FIR history from the
    # queue; feeding it separately keeps every later chunk boundary
    # pull-aligned, so steady state re-uses a handful of compiled
    # slice shapes instead of compiling fresh ones every pass
    feed.feed_buffer(np.zeros(K - 1, np.complex64))

    warm_cs = run_pass(pools[-1])
    assert np.isfinite(warm_cs)
    seg = topo._segments[0]
    assert seg.engage_count >= 1, "segment never engaged"

    t0 = time.perf_counter()
    checksum = 0.0
    for i in range(ITERS):
        checksum += run_pass(pools[i])
    dt = (time.perf_counter() - t0) / ITERS
    assert np.isfinite(checksum)
    samples = CHUNK * CHUNKS_PER_ITER
    msamp = samples / dt / 1e6

    print(json.dumps({
        "metric": "fir_fft_topology_throughput",
        "value": round(msamp, 2),
        "unit": "Msamples/s",
        "fused_elements": seg.fused_elements,
        "engages": seg.engage_count,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    sys.exit(main())
