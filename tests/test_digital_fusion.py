"""Fused-vs-streaming parity for the digital symbol/coding chain.

Round-5 VERDICT #1/#3/#7: the digital blocks get device cores + the
fuse protocol (reference bar: every block gets its compiled kernel,
math/Arithmetic.cpp:46-67), fused segments carry labels through
(label transparency), and fan-in heads engage (Arithmetic).

All parity checks are BIT-exact: the integer-plane device cores
(ops/digital_device.py, ops/gf2.py) are exact f32 arithmetic.
"""

import numpy as np
import pytest

from pothoscomms_tpu import BlockRegistry, Topology
from pothoscomms_tpu.core.fixtures import CollectorSink, FeederSource
from pothoscomms_tpu.core.labels import Label

THRESH = 4096


def run_chain(build, feeds, fuse, threshold=THRESH, dtype_in="uint8",
              dtype_out="uint8"):
    blocks = build()
    feed = FeederSource(dtype_in)
    sink = CollectorSink(dtype_out)
    topo = Topology()
    if not fuse:
        topo.auto_fuse = False
    topo.fuse_threshold = threshold
    chain = [feed] + blocks + [sink]
    for a, b in zip(chain[:-1], chain[1:]):
        topo.connect(a, 0, b, 0)
    for item in feeds:
        if isinstance(item, tuple):
            feed.feed_buffer(item[0], item[1])
        else:
            feed.feed_buffer(item)
    topo.commit()
    assert topo.wait_inactive(timeout=30.0)
    return sink, topo


def assert_parity(build, feeds, dtype_in="uint8", dtype_out="uint8",
                  expect_engaged=True, threshold=THRESH):
    s_fused, topo = run_chain(build, feeds, True, threshold, dtype_in,
                              dtype_out)
    s_stream, _ = run_chain(build, feeds, False, threshold, dtype_in,
                            dtype_out)
    a, b = s_fused.get_buffer(), s_stream.get_buffer()
    assert a.shape == b.shape, (a.shape, b.shape)
    np.testing.assert_array_equal(a, b)
    if expect_engaged:
        assert topo._segments and topo._segments[0].fused_elements > 0, \
            "segment never engaged (fused path untested)"
    return s_fused, s_stream, topo


rng = np.random.default_rng(99)


# --------------------------------------------------------------------- #
# converters
# --------------------------------------------------------------------- #
@pytest.mark.parametrize("mod", [1, 2, 3, 7, 8])
@pytest.mark.parametrize("order", ["LSBit", "MSBit"])
def test_bits_to_symbols_fused(mod, order):
    def build():
        b = BlockRegistry.make("/comms/bits_to_symbols", mod, order)
        s = BlockRegistry.make("/comms/symbols_to_bits", mod, order)
        return [b, s]

    bits = rng.integers(0, 2, mod * 8192).astype(np.uint8)
    assert_parity(build, [bits])


@pytest.mark.parametrize("mod", [2, 3, 5, 8])
def test_symbols_bytes_roundtrip_fused(mod):
    import pothoscomms_tpu.ops.bits as bops

    def build():
        a = BlockRegistry.make("/comms/symbols_to_bytes", mod, "MSBit")
        b = BlockRegistry.make("/comms/bytes_to_symbols", mod, "MSBit")
        return [a, b]

    g = bops.group_symbols(mod)
    syms = rng.integers(0, 1 << mod, g * 8192).astype(np.uint8)
    assert_parity(build, [syms])


# --------------------------------------------------------------------- #
# mapper -> slicer
# --------------------------------------------------------------------- #
def test_mapper_slicer_fused():
    table = np.array([1 + 1j, -1 + 1j, -1 - 1j, 1 - 1j]) / np.sqrt(2)

    def build():
        m = BlockRegistry.make("/comms/symbol_mapper", "complex_float32")
        m.set_map(table)
        s = BlockRegistry.make("/comms/symbol_slicer", "complex_float32")
        s.set_map(table)
        return [m, s]

    idx = rng.integers(0, 4, 32768).astype(np.uint8)
    assert_parity(build, [idx])


# --------------------------------------------------------------------- #
# differential coding
# --------------------------------------------------------------------- #
@pytest.mark.parametrize("N", [2, 4, 7])
def test_differential_roundtrip_fused(N):
    def build():
        e = BlockRegistry.make("/comms/differential_encoder")
        e.set_symbols(N)
        d = BlockRegistry.make("/comms/differential_decoder")
        d.set_symbols(N)
        return [e, d]

    x = rng.integers(0, N, 40000).astype(np.uint8)
    # multiple feeds: engage/disengage cycling must keep the carry exact
    assert_parity(build, [x[:17000], x[17000:17003], x[17003:]])


# --------------------------------------------------------------------- #
# scramblers: blocked GF(2) state-space vs bit-serial streaming
# --------------------------------------------------------------------- #
@pytest.mark.parametrize("mode", ["additive", "multiplicative"])
@pytest.mark.parametrize("poly", [0x19, 0x8E, (1 << 31) | (1 << 3) | 1])
def test_scrambler_descrambler_fused(mode, poly):
    def build():
        s = BlockRegistry.make("/comms/scrambler")
        s.set_mode(mode)
        s.set_poly(poly)
        s.set_seed(0x5A5A)
        d = BlockRegistry.make("/comms/descrambler")
        d.set_mode(mode)
        d.set_poly(poly)
        d.set_seed(0x5A5A)
        return [s, d]

    bits = rng.integers(0, 2, 3 * THRESH + 1024).astype(np.uint8)
    f, s, _ = assert_parity(build, [bits])
    # multiplicative descrambling is self-synchronizing: the round trip
    # recovers the input after the (degree)-bit transient
    if mode == "multiplicative":
        got = f.get_buffer()
        assert np.array_equal(got[64:], bits[64: len(got)])
    else:
        assert np.array_equal(f.get_buffer(), bits[: len(f.get_buffer())])


def test_scrambler_state_continuity_across_engagements():
    """Feed in several spurts so the segment engages, drains, disengages
    and re-engages; the GF(2) carry must hand back the exact LFSR state
    each time."""
    def build():
        s = BlockRegistry.make("/comms/scrambler")
        s.set_mode("multiplicative")
        s.set_poly(0x19)
        s2 = BlockRegistry.make("/comms/scrambler")
        s2.set_mode("additive")
        s2.set_poly(0x8E)
        s2.set_seed(0x77)
        return [s, s2]

    bits = rng.integers(0, 2, 30000).astype(np.uint8)
    feeds = [bits[:9000], bits[9000:9100], bits[9100:21000], bits[21000:]]
    assert_parity(build, feeds)


# --------------------------------------------------------------------- #
# bitwise family / byte order
# --------------------------------------------------------------------- #
def test_const_bitwise_and_shift_fused():
    def build():
        a = BlockRegistry.make("/comms/const_bitwise_binary", "uint8",
                               0x5C, "XOR")
        b = BlockRegistry.make("/comms/bitshift", "uint8", "RIGHTSHIFT", 2)
        c = BlockRegistry.make("/comms/bitwise_unary", "uint8", "NOT")
        return [a, b, c]

    x = rng.integers(0, 256, 30000).astype(np.uint8)
    assert_parity(build, [x])


# --------------------------------------------------------------------- #
# label transparency: fused segments carry labels through
# --------------------------------------------------------------------- #
def test_labels_carried_through_fused_digital_segment():
    def build():
        s = BlockRegistry.make("/comms/scrambler")
        s.set_mode("additive")
        s.set_poly(0x8E)
        b = BlockRegistry.make("/comms/bits_to_symbols", 4, "MSBit")
        return [s, b]

    bits = rng.integers(0, 2, 3 * THRESH * 4).astype(np.uint8)
    labels = [Label("frame", data=i, index=3000 * i + 16, width=4)
              for i in range(8)]
    feeds = [(bits, labels)]
    s_fused, topo = run_chain(build, feeds, True)
    s_stream, _ = run_chain(build, feeds, False)
    np.testing.assert_array_equal(s_fused.get_buffer(),
                                  s_stream.get_buffer())
    lf = [(lb.id, lb.data, lb.index, lb.width) for lb in s_fused.get_labels()]
    ls = [(lb.id, lb.data, lb.index, lb.width) for lb in s_stream.get_labels()]
    assert lf == ls and len(lf) == 8
    seg = topo._segments[0]
    assert seg.label_transparent
    assert seg.fused_elements > 0, "labels should not block engagement"


def test_label_opaque_segment_still_disengages():
    """A Scale-bearing run (label-driven factor) must NOT be label
    transparent."""
    def build():
        sc = BlockRegistry.make("/comms/scale", "float32")
        sc.set_factor(2.0)
        ab = BlockRegistry.make("/comms/abs", "float32")
        return [sc, ab]

    x = rng.normal(size=3 * THRESH).astype(np.float32)
    s_f, topo = run_chain(build, [(x, [Label("f", 0.5, 5000)])], True,
                          dtype_in="float32", dtype_out="float32")
    assert topo._segments and not topo._segments[0].label_transparent


# --------------------------------------------------------------------- #
# fan-in heads (VERDICT r4 #3)
# --------------------------------------------------------------------- #
def test_fanin_arithmetic_fft_single_segment():
    nb = 256

    def mk(fuse):
        f1 = FeederSource("complex_float32")
        f2 = FeederSource("complex_float32")
        ar = BlockRegistry.make("/comms/arithmetic", "complex_float32",
                                "ADD")
        fft = BlockRegistry.make("/comms/fft", "complex_float32", nb, False)
        sink = CollectorSink("complex_float32")
        topo = Topology()
        topo.auto_fuse = fuse
        topo.fuse_threshold = THRESH
        topo.connect(f1, 0, ar, 0)
        topo.connect(f2, 0, ar, 1)
        topo.connect(ar, 0, fft, 0)
        topo.connect(fft, 0, sink, 0)
        return topo, (f1, f2), sink

    n = 4 * THRESH
    a = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    b = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)

    topo, (f1, f2), sink = mk(True)
    f1.feed_buffer(a)
    f2.feed_buffer(b)
    topo.commit()
    assert topo.wait_inactive(timeout=30.0)
    seg = topo._segments[0] if topo._segments else None
    assert seg is not None and len(seg.blocks) == 2 and len(seg.heads) == 2
    assert seg.fused_elements > 0, "fan-in segment never engaged"

    topo2, (g1, g2), sink2 = mk(False)
    g1.feed_buffer(a)
    g2.feed_buffer(b)
    topo2.commit()
    assert topo2.wait_inactive(timeout=30.0)
    got, exp = sink.get_buffer(), sink2.get_buffer()
    assert got.shape == exp.shape
    np.testing.assert_allclose(got, exp, atol=2e-4)


def test_fanin_comparator_segment():
    def mk(fuse):
        f1 = FeederSource("float32")
        f2 = FeederSource("float32")
        cmp = BlockRegistry.make("/comms/comparator", "float32", ">")
        # interior hop so a >=2-block run forms
        nt = BlockRegistry.make("/comms/bitwise_unary", "int8", "NOT")
        sink = CollectorSink("int8")
        topo = Topology()
        topo.auto_fuse = fuse
        topo.fuse_threshold = THRESH
        topo.connect(f1, 0, cmp, 0)
        topo.connect(f2, 0, cmp, 1)
        topo.connect(cmp, 0, nt, 0)
        topo.connect(nt, 0, sink, 0)
        return topo, (f1, f2), sink

    n = 4 * THRESH
    a = rng.normal(size=n).astype(np.float32)
    b = rng.normal(size=n).astype(np.float32)
    outs = []
    for fuse in (True, False):
        topo, (f1, f2), sink = mk(fuse)
        f1.feed_buffer(a)
        f2.feed_buffer(b)
        topo.commit()
        assert topo.wait_inactive(timeout=30.0)
        if fuse:
            seg = topo._segments[0]
            assert seg.fused_elements > 0
        outs.append(sink.get_buffer())
    np.testing.assert_array_equal(outs[0], outs[1])


def test_fanin_combine_complex_segment():
    def mk(fuse):
        f1 = FeederSource("float32")
        f2 = FeederSource("float32")
        cc = BlockRegistry.make("/comms/combine_complex", "float32")
        rot = BlockRegistry.make("/comms/rotate", "complex_float32")
        rot.set_phase(0.7)
        sink = CollectorSink("complex_float32")
        topo = Topology()
        topo.auto_fuse = fuse
        topo.fuse_threshold = THRESH
        topo.connect(f1, 0, cc, "re")
        topo.connect(f2, 0, cc, "im")
        topo.connect(cc, 0, rot, 0)
        topo.connect(rot, 0, sink, 0)
        return topo, (f1, f2), sink

    n = 4 * THRESH
    a = rng.normal(size=n).astype(np.float32)
    b = rng.normal(size=n).astype(np.float32)
    outs = []
    for fuse in (True, False):
        topo, (f1, f2), sink = mk(fuse)
        f1.feed_buffer(a)
        f2.feed_buffer(b)
        topo.commit()
        assert topo.wait_inactive(timeout=30.0)
        if fuse:
            assert topo._segments and topo._segments[0].fused_elements > 0
        outs.append(sink.get_buffer())
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-5)


# --------------------------------------------------------------------- #
# the full modem TX -> RX chain, one fused segment each side
# --------------------------------------------------------------------- #
def test_full_modem_chain_fused_bit_exact():
    table = np.array([1 + 1j, -1 + 1j, -1 - 1j, 1 - 1j]) / np.sqrt(2)

    def build_tx():
        s = BlockRegistry.make("/comms/scrambler")
        s.set_mode("additive")
        s.set_poly(0x8E)
        b2s = BlockRegistry.make("/comms/bits_to_symbols", 2, "MSBit")
        m = BlockRegistry.make("/comms/symbol_mapper", "complex_float32")
        m.set_map(table)
        return [s, b2s, m]

    def build_rx():
        sl = BlockRegistry.make("/comms/symbol_slicer", "complex_float32")
        sl.set_map(table)
        s2b = BlockRegistry.make("/comms/symbols_to_bits", 2, "MSBit")
        d = BlockRegistry.make("/comms/descrambler")
        d.set_mode("additive")
        d.set_poly(0x8E)
        return [sl, s2b, d]

    bits = rng.integers(0, 2, 8 * THRESH).astype(np.uint8)

    def build_full():
        return build_tx() + build_rx()

    f, s, topo = assert_parity(build_full, [bits])
    # end-to-end: the link is transparent
    np.testing.assert_array_equal(f.get_buffer(), bits)
    # ONE segment spanning all six blocks
    assert len(topo._segments) == 1
    assert len(topo._segments[0].blocks) == 6


# --------------------------------------------------------------------- #
# fusion past float32 (VERDICT r4 #7): int16 planes
# --------------------------------------------------------------------- #
def test_int16_fft_chain_fused_bit_exact():
    """complex_int16 byte_order -> FFT engages as a fused segment; the
    int16 plane computes in f32 and rounds per the kiss FIXED_POINT
    contract, bit-identical to the streaming path."""
    nb = 64

    def build():
        bo = BlockRegistry.make("/comms/byte_order", "complex_int16")
        bo.set_byte_order("Swap Order")
        fft = BlockRegistry.make("/comms/fft", "complex_int16", nb, False)
        return [bo, fft]

    n = 8 * THRESH
    x = rng.integers(-500, 500, (n, 2)).astype(np.int16)
    f, s, topo = assert_parity(build, [x], dtype_in="complex_int16",
                               dtype_out="complex_int16")
    assert topo._segments[0].fused_elements > 0


def test_int16_byte_order_chain_fused():
    def build():
        a = BlockRegistry.make("/comms/byte_order", "uint16")
        a.set_byte_order("Swap Order")
        b = BlockRegistry.make("/comms/bitshift", "uint16", "RIGHTSHIFT", 3)
        return [a, b]

    x = rng.integers(0, 1 << 16, 30000).astype(np.uint16)
    assert_parity(build, [x], dtype_in="uint16", dtype_out="uint16")


# --------------------------------------------------------------------- #
# Threshold passthrough fusion (id-less: no labels, exact state carry)
# --------------------------------------------------------------------- #
def test_threshold_fused_passthrough_and_state():
    def build():
        th = BlockRegistry.make("/comms/threshold", "float32")
        th.set_activation_level(0.5)
        th.set_deactivation_level(-0.5)
        ab = BlockRegistry.make("/comms/abs", "float32")
        return [th, ab]

    x = rng.normal(size=3 * THRESH).astype(np.float32)
    f, s, topo = assert_parity(build, [x[:10000], x[10000:]],
                               dtype_in="float32", dtype_out="float32")
    # the hysteresis state advanced on device and was imported back
    th_f = topo._segments[0].blocks[0]
    # streaming oracle for the final state
    state = False
    for v in x:
        if not state and v > 0.5:
            state = True
        elif state and v < -0.5:
            state = False
    topo._segments[0].disengage()
    assert th_f._active_state == state


def test_threshold_with_label_ids_streams():
    def build():
        th = BlockRegistry.make("/comms/threshold", "float32")
        th.set_activation_level(0.5)
        th.set_deactivation_level(-0.5)
        th.set_activation_id("up")
        ab = BlockRegistry.make("/comms/abs", "float32")
        return [th, ab]

    x = rng.normal(size=3 * THRESH).astype(np.float32)
    s_f, topo = run_chain(build, [x], True, dtype_in="float32",
                          dtype_out="float32")
    s_s, _ = run_chain(build, [x], False, dtype_in="float32",
                       dtype_out="float32")
    np.testing.assert_array_equal(s_f.get_buffer(), s_s.get_buffer())
    lf = [(lb.id, lb.index) for lb in s_f.get_labels()]
    ls = [(lb.id, lb.index) for lb in s_s.get_labels()]
    assert lf == ls and len(lf) > 0


# --------------------------------------------------------------------- #
# SplitComplex: a 2-output TAIL (one DeviceChunk per output port)
# --------------------------------------------------------------------- #
def test_split_complex_fused_tail():
    def mk(fuse):
        feed = FeederSource("complex_float32")
        rot = BlockRegistry.make("/comms/rotate", "complex_float32")
        rot.set_phase(0.3)
        sp = BlockRegistry.make("/comms/split_complex", "float32")
        s_re = CollectorSink("float32")
        s_im = CollectorSink("float32")
        topo = Topology()
        topo.auto_fuse = fuse
        topo.fuse_threshold = THRESH
        topo.connect(feed, 0, rot, 0)
        topo.connect(rot, 0, sp, 0)
        topo.connect(sp, "re", s_re, 0)
        topo.connect(sp, "im", s_im, 0)
        return topo, feed, (s_re, s_im)

    n = 4 * THRESH
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    res = []
    for fuse in (True, False):
        topo, feed, sinks = mk(fuse)
        feed.feed_buffer(x)
        topo.commit()
        assert topo.wait_inactive(timeout=30.0)
        if fuse:
            seg = topo._segments[0]
            assert len(seg.blocks) == 2 and len(seg.tail_outs) == 2
            assert seg.fused_elements > 0, "split tail never engaged"
        res.append((sinks[0].get_buffer(), sinks[1].get_buffer()))
    np.testing.assert_allclose(res[0][0], res[1][0], atol=1e-5)
    np.testing.assert_allclose(res[0][1], res[1][1], atol=1e-5)


def test_bitwise_binary_fanin_fused():
    def mk(fuse):
        f1, f2 = FeederSource("uint8"), FeederSource("uint8")
        bw = BlockRegistry.make("/comms/bitwise_binary", "uint8", "XOR", 2)
        nt = BlockRegistry.make("/comms/bitwise_unary", "uint8", "NOT")
        sink = CollectorSink("uint8")
        topo = Topology()
        topo.auto_fuse = fuse
        topo.fuse_threshold = THRESH
        topo.connect(f1, 0, bw, 0)
        topo.connect(f2, 0, bw, 1)
        topo.connect(bw, 0, nt, 0)
        topo.connect(nt, 0, sink, 0)
        return topo, (f1, f2), sink

    n = 4 * THRESH
    a = rng.integers(0, 256, n).astype(np.uint8)
    b = rng.integers(0, 256, n).astype(np.uint8)
    outs = []
    for fuse in (True, False):
        topo, (f1, f2), sink = mk(fuse)
        f1.feed_buffer(a)
        f2.feed_buffer(b)
        topo.commit()
        assert topo.wait_inactive(timeout=30.0)
        if fuse:
            assert topo._segments and topo._segments[0].fused_elements > 0
        outs.append(sink.get_buffer())
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], (~(a ^ b)).astype(np.uint8))


def test_modf_fused_two_output_tail():
    def mk(fuse):
        feed = FeederSource("float32")
        ab = BlockRegistry.make("/comms/abs", "float32")
        mf = BlockRegistry.make("/comms/modf", "float32")
        si, sf = CollectorSink("float32"), CollectorSink("float32")
        topo = Topology()
        topo.auto_fuse = fuse
        topo.fuse_threshold = THRESH
        topo.connect(feed, 0, ab, 0)
        topo.connect(ab, 0, mf, 0)
        topo.connect(mf, "int", si, 0)
        topo.connect(mf, "frac", sf, 0)
        return topo, feed, (si, sf)

    n = 4 * THRESH
    x = (rng.normal(size=n) * 10).astype(np.float32)
    res = []
    for fuse in (True, False):
        topo, feed, sinks = mk(fuse)
        feed.feed_buffer(x)
        topo.commit()
        assert topo.wait_inactive(timeout=30.0)
        if fuse:
            assert topo._segments and topo._segments[0].fused_elements > 0
        res.append((sinks[0].get_buffer(), sinks[1].get_buffer()))
    np.testing.assert_allclose(res[0][0], res[1][0], atol=1e-6)
    np.testing.assert_allclose(res[0][1], res[1][1], atol=1e-6)
