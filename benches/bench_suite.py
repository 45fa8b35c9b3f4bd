"""Benchmark suite covering the BASELINE.json configs.

Each benchmark prints one JSON line {"metric", "value", "unit", ...}.
``bench.py`` at the repo root remains the headline (FIR+FFT 256-ch);
this suite adds:

- fft_64ch_1024: batched 1024-pt complex FFT over 64 channels
- resampler_3_2: polyphase 3:2 rational resampler with stateful taps
- fm_chain_256ch: freq_demod -> dc_removal -> envelope_detector fused
  via the chain compiler (the real product path), 256 channels
- digital_link: framed link, bit-exact frames (host/control path)

Timing discipline: the device relay memoizes identical executions, so
every loop either chains outputs into inputs or cycles a pool of
distinct inputs.

Run: PYTHONPATH=/root/repo python benches/bench_suite.py [name ...]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _timeit_chained(fn, x0, iters=8):
    """Time fn where fn's output is a valid next input."""
    import jax

    z = fn(x0)
    jax.block_until_ready(z)
    t0 = time.perf_counter()
    for _ in range(iters):
        z = fn(z)
    jax.block_until_ready(z)
    return (time.perf_counter() - t0) / iters


def _timeit_pool(fn, pool, iters=8):
    """Time fn cycling distinct inputs (defeats relay memoization)."""
    import jax

    outs = [fn(p) for p in pool]
    jax.block_until_ready(outs[-1])
    t0 = time.perf_counter()
    r = None
    for i in range(iters):
        r = fn(pool[i % len(pool)])
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def bench_fft_64ch_1024():
    import jax
    import jax.numpy as jnp
    from pothoscomms_tpu.parallel.fft import fft_planar

    C, NB, FRAMES = 64, 1024, 32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(C * FRAMES, NB, 2)).astype(np.float32))
    f = jax.jit(lambda z: fft_planar(z, NB, False))
    dt = _timeit_chained(f, x)
    samples = C * FRAMES * NB
    return {"metric": "fft_64ch_1024pt", "value": round(samples / dt / 1e6, 2),
            "unit": "Msamples/s"}


def bench_resampler_3_2():
    import jax
    import jax.numpy as jnp
    from pothoscomms_tpu.ops.filter import polyphase_fir

    # 3:2 polyphase rational resampler, planar-complex f32, stateful taps
    M, L, K_TAPS = 2, 3, 60
    rng = np.random.default_rng(1)
    taps = (rng.normal(size=K_TAPS) + 1j * rng.normal(size=K_TAPS)) / K_TAPS
    K = K_TAPS // L
    phases = np.zeros((L, K), np.complex128)
    for j in range(L):
        for k in range(K):
            phases[j, k] = taps[j + k * L]
    taps_q = jnp.asarray(
        np.stack([phases.real, phases.imag], -1).astype(np.float32)
    )
    N = 1 << 19
    x0 = jnp.asarray(
        rng.normal(size=(N + K - 1, 2)).astype(np.float32)
    )
    f = jax.jit(
        lambda z: polyphase_fir(z, taps_q, M, L, K, "planar", 0)
    )
    # output len = N*L/M > N+K-1: chain by slicing the front
    g = jax.jit(lambda z: f(z)[: N + K - 1] * 0.5)
    dt = _timeit_chained(g, x0)
    return {"metric": "resampler_3to2_1ch", "value": round(N / dt / 1e6, 2),
            "unit": "Msamples/s"}


def bench_fm_chain_256ch():
    import jax.numpy as jnp
    from pothoscomms_tpu import BlockRegistry
    from pothoscomms_tpu.parallel.compiler import compile_chain

    C, T = 256, 16384
    rng = np.random.default_rng(2)
    demod = BlockRegistry.make("/comms/freq_demod", "complex_float32")
    dc = BlockRegistry.make("/comms/dc_removal", "float32")
    dc.set_average_size(64)
    dc.set_cascade_size(2)
    env = BlockRegistry.make("/comms/envelope_detector", "float32")
    env.set_attack(10.0)
    env.set_release(40.0)
    step, carry0 = compile_chain([demod, dc, env], channels=C)

    pool = [
        jnp.asarray(rng.normal(size=(C, T, 2)).astype(np.float32))
        for _ in range(4)
    ]
    state = {"carry": carry0}

    def run(x):
        y, state["carry"] = step(x, state["carry"])
        return y

    dt = _timeit_pool(run, pool)
    return {"metric": "fm_chain_256ch", "value": round(C * T / dt / 1e6, 2),
            "unit": "Msamples/s"}


def bench_digital_link():
    from pothoscomms_tpu import BlockRegistry, Packet, Topology
    from pothoscomms_tpu.core.fixtures import CollectorSink, FeederSource

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
