"""Channel-sharded full digital link (BASELINE.json config #5).

    scrambler -> symbol_mapper -> frame_insert -> [upsample] -> channel
    -> sharded sync search (device) -> frame automaton + header decode
    -> symbol_slicer -> descrambler

TX runs per channel through the product blocks on the streaming runtime
(bit-level fidelity); the receive-side search — the expensive part, the
reference's hottest loop (digital/FrameSync.cpp:470-497) — runs as ONE
device program over all channels: ``ops.framing.sync_search_planar``
vmapped over the channel axis and ``shard_map``-ed over the mesh "ch"
axis, so C/n channels live on each device. The tiny per-channel
acceptance automaton + Hamming header decode stay on the host
(blocks/framing.py — the same code the FrameSync block runs), then
SymbolSlicer + Descrambler blocks recover the payload bits.

Bit-exactness note: with rectangular pulses the reference's optimal
bit-sampling search can settle one symbol late (FrameSync.cpp:709-721),
so each frame carries an 8-bit zero pilot prefix + 8-bit zero pad; the
pilot resolves the alignment and the recovered payload is then exactly
the transmitted bits.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from pothoscomms_tpu.core.labels import Label
from pothoscomms_tpu.core.registry import BlockRegistry
from pothoscomms_tpu.parallel import cplx
from pothoscomms_tpu.ops.framing import bucket_len, sync_search_planar
from pothoscomms_tpu.blocks.framing import (
    NUM_HEADER_BITS,
    CORR_DUR_PERCENT,
    CORR_MAG_PERCENT,
    new_sync_state,
    process_header_bits,
    run_sync_automaton,
)

PILOT_BITS = 8  # known-zero prefix/suffix resolving bit-clock alignment


def _run_topology(blocks, feed, sink):
    from pothoscomms_tpu.core.topology import Topology

    topo = Topology()
    chain = [feed] + blocks + [sink]
    for a, b in zip(chain[:-1], chain[1:]):
        topo.connect(a, 0, b, 0)
    topo.commit()
    if not topo.wait_inactive(timeout=60.0):
        raise RuntimeError("topology did not quiesce")
    return sink


def tx_waveform(bits: np.ndarray, *, poly: int = 0x19, seed: int = 1,
                header_id: int = 0x55, symbol_width: int = 20,
                data_width: int = 4, preamble=(1.0,)) -> np.ndarray:
    """One channel's TX: scrambler -> BPSK mapper -> frame_insert ->
    rectangular-pulse upsample (fir_filter interp=data_width). Returns
    the complex64 baseband waveform of one frame."""
    from pothoscomms_tpu.core.fixtures import CollectorSink, FeederSource

    payload = np.concatenate([
        np.zeros(PILOT_BITS, np.uint8),
        np.asarray(bits, np.uint8) & 1,
        np.zeros(PILOT_BITS, np.uint8),
    ])

    scr = BlockRegistry.make("/comms/scrambler")
    scr.set_mode("additive")
    scr.set_poly(poly)
    scr.set_seed(seed)
    mapper = BlockRegistry.make("/comms/symbol_mapper", "complex_float64")
    mapper.set_map([-1.0, 1.0])
    insert = BlockRegistry.make("/comms/frame_insert", "complex_float64")
    insert.set_preamble(np.asarray(preamble, np.complex128))
    insert.set_symbol_width(symbol_width)
    insert.set_header_id(header_id)
    insert.set_frame_start_id("txStart")
    insert.set_frame_end_id("")
    up = BlockRegistry.make("/comms/fir_filter", "complex_float64", "COMPLEX")
    up.set_interpolation(data_width)
    up.set_taps(np.ones(data_width))

    feed = FeederSource("uint8")
    feed.feed_buffer(payload, [Label("txStart", len(payload), 0, 1)])
    sink = CollectorSink("complex_float64")
    _run_topology([scr, mapper, insert, up], feed, sink)
    return sink.get_buffer().astype(np.complex64)


def apply_channel(wave: np.ndarray, *, gap_pre: int = 400,
                  gap_post: int = 600, attenuation: float = 0.5,
                  phase: float = 0.0, freq_offset: float = 0.0,
                  noise: float = 0.0,
                  rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Physical channel: idle gaps, attenuation, static phase, carrier
    frequency offset, AWGN."""
    sig = np.concatenate([
        np.zeros(gap_pre, np.complex64), wave,
        np.zeros(gap_post, np.complex64),
    ])
    n = len(sig)
    sig = sig * attenuation * np.exp(
        1j * (phase + freq_offset * np.arange(n)))
    if noise > 0:
        rng = rng or np.random.default_rng(0)
        sig = sig + noise * (rng.normal(size=n) + 1j * rng.normal(size=n))
    return sig.astype(np.complex64)


def make_sharded_search(mesh: Mesh, preamble, symbol_width: int,
                        data_width: int, input_threshold: float,
                        length: int):
    """Build the channel-sharded device search.

    Returns (search, n_pad): search(x [C, Lp, 2]) -> 4 arrays [C, n_pad],
    with channels split over the mesh "ch" axis. Lp = bucket_len of
    ``length`` (pad inputs with zeros).
    """
    pre = np.asarray(preamble)
    npre = len(pre)
    w = symbol_width * data_width
    sw = w * npre
    fw = sw + NUM_HEADER_BITS * data_width
    lp = bucket_len(length, minimum=max(2 * fw, 1024))
    n_pad = lp - fw + 1
    pre_p = jnp.asarray(cplx.to_planar(pre))
    thr = float(input_threshold)

    def one(xc):
        return sync_search_planar(xc, pre_p, thr, sw, w, data_width,
                                  npre, n_pad)

    sharded = jax.jit(shard_map(
        jax.vmap(one), mesh=mesh,
        in_specs=P("ch"), out_specs=P("ch"),
    ))
    return sharded, lp, n_pad


def rx_decode(wave: np.ndarray, arrays, n_bits: int, *, poly: int = 0x19,
              seed: int = 1, header_id: int = 0x55, symbol_width: int = 20,
              data_width: int = 4, preamble=(1.0,)) -> Optional[np.ndarray]:
    """One channel's RX given precomputed search arrays: acceptance
    automaton + header decode (shared FrameSync code), payload symbol
    recovery with phase-ramp compensation, then SymbolSlicer ->
    Descrambler blocks. Returns the recovered payload bits or None."""
    from pothoscomms_tpu.core.fixtures import CollectorSink, FeederSource

    pre = np.asarray(preamble, np.complex128)
    w = symbol_width * data_width
    sw = w * len(pre)
    fw = sw + NUM_HEADER_BITS * data_width
    mag_thresh = int(sw * CORR_MAG_PERCENT)
    dur_thresh = int(sw * CORR_DUR_PERCENT)

    from pothoscomms_tpu.blocks.framing import header_checksum

    est = {}  # estimates captured from the automaton state at detection

    def try_decode(frame_offset, st):
        # frame_offset >= 0 guaranteed by run_sync_automaton's guard
        first_bit, fields = process_header_bits(
            wave[frame_offset:], st["delta_fc_max"], st["scale_at_max"],
            st["phase_off_max"], sw, symbol_width, data_width, fw, pre[-1])
        if fields is None or fields["error"]:
            return None
        if fields["chksum"] != header_checksum(fields["id"],
                                               fields["length"]):
            return None
        if fields["id"] != header_id or fields["length"] == 0:
            return None
        est.update(scale=st["scale_at_max"], dfc=st["delta_fc_max"],
                   pho=st["phase_off_max"])
        return first_bit, fields["length"]

    hit = run_sync_automaton(new_sync_state(), arrays, mag_thresh,
                             dur_thresh, try_decode)
    if hit is None:
        return None
    _, frame_offset, (first_bit, length) = hit
    st_off = frame_offset
    # payload symbol recovery (TIMING-style: 1 sample per symbol at the
    # decimated bit clock, scale + phase-ramp compensated)
    rel0 = first_bit + NUM_HEADER_BITS * data_width
    k = np.arange(length)
    rel = rel0 + k * data_width
    idx = st_off + rel
    if idx[-1] >= len(wave):
        return None
    # phase/scale correction from the automaton's accepted estimates
    # (same math as FrameSync TIMING output: y = x*scale*e^{j(ph0+dfc rel)})
    syms = wave[idx] * est["scale"] * np.exp(
        1j * (est["pho"] + est["dfc"] * rel))

    slicer = BlockRegistry.make("/comms/symbol_slicer", "complex_float64")
    slicer.set_map([-1.0, 1.0])
    feed = FeederSource("complex_float64")
    feed.feed_buffer(syms.astype(np.complex128))
    sink = CollectorSink("uint8")
    _run_topology([slicer], feed, sink)
    rx_bits = sink.get_buffer()

    # alignment via the zero pilot: descramble at candidate shifts and
    # pick the one whose pilot region is all zeros
    for shift in (0, 1, 2):
        desc = BlockRegistry.make("/comms/descrambler")
        desc.set_mode("additive")
        desc.set_poly(poly)
        desc.set_seed(seed)
        feed = FeederSource("uint8")
        # prepend `shift` dummies so the keystream aligns with the TX
        # payload position of each received bit
        feed.feed_buffer(np.concatenate(
            [np.zeros(shift, np.uint8), rx_bits]))
        sink = CollectorSink("uint8")
        _run_topology([desc], feed, sink)
        out = sink.get_buffer()[shift:]
        pilot = out[: PILOT_BITS - shift]
        if pilot.size and not pilot.any():
            rec = out[PILOT_BITS - shift: PILOT_BITS - shift + n_bits]
            if len(rec) == n_bits:
                return rec
    return None


def run_sharded_link(mesh: Mesh, n_channels: int, n_bits: int = 64,
                     seed: int = 7, noise: float = 0.0) -> dict:
    """End-to-end link over ``n_channels`` independent channels with the
    search sharded over ``mesh``. Returns dict with per-channel exactness
    and the single-device-vs-sharded search parity error."""
    rng = np.random.default_rng(seed)
    symbol_width, data_width = 20, 4
    tx_bits = [rng.integers(0, 2, n_bits).astype(np.uint8)
               for _ in range(n_channels)]
    waves = []
    for c in range(n_channels):
        wave = tx_waveform(tx_bits[c], symbol_width=symbol_width,
                           data_width=data_width)
        waves.append(apply_channel(
            wave,
            gap_pre=300 + 40 * c,
            gap_post=500 - 40 * (c % 8),
            attenuation=0.4 + 0.05 * (c % 8),
            phase=0.3 * c,
            freq_offset=1e-4 * ((c % 5) - 2),
            noise=noise,
            rng=np.random.default_rng(seed + 100 + c),
        ))
    length = max(len(w) for w in waves)
    search, lp, n_pad = make_sharded_search(
        mesh, [1.0], symbol_width, data_width, 0.01, length)
    x = np.zeros((n_channels, lp, 2), np.float32)
    for c, wv in enumerate(waves):
        x[c, : len(wv)] = cplx.to_planar(wv)
    scale, dfc, pho, peak = search(jnp.asarray(x))
    scale, dfc, pho, peak = (np.asarray(scale), np.asarray(dfc),
                             np.asarray(pho),
                             np.asarray(peak).astype(np.int64))

    ok = []
    for c in range(n_channels):
        n_off = len(waves[c]) - (lp - n_pad)  # valid offsets for channel c
        arrays = (scale[c][:n_off], dfc[c][:n_off], pho[c][:n_off],
                  peak[c][:n_off])
        rec = rx_decode(waves[c], arrays, n_bits,
                        symbol_width=symbol_width, data_width=data_width)
        ok.append(rec is not None and np.array_equal(rec, tx_bits[c]))
    return {
        "channels": n_channels,
        "bit_exact": ok,
        "all_exact": all(ok),
        "devices": int(np.prod(list(mesh.shape.values()))),
    }
