"""Digital symbol-layer tests.

Mirrors reference tests digital/TestSymbolBitConversions.cpp,
TestSymbolByteConversions.cpp (round-trip chains over width x order
matrix), TestDifferentialCoding.cpp, TestSymbolMapperSlicer.cpp,
TestBitwise.cpp, TestByteOrder.cpp — plus oracle checks of the
vectorized pack kernels against direct ports of the reference's
unrolled per-width loops (digital/SymbolHelpers.hpp).
"""

import numpy as np
import pytest

from pothoscomms_tpu import BlockRegistry, Label, Topology
from pothoscomms_tpu.core.fixtures import CollectorSink, FeederSource
from pothoscomms_tpu.core.packet import Packet
from pothoscomms_tpu.core.testing import assert_buffers_equal
from pothoscomms_tpu.ops import bits as bops


# ---------------------------------------------------------------------- #
# Oracles: direct ports of the reference unrolled loops
# (digital/SymbolHelpers.hpp:13-72)
# ---------------------------------------------------------------------- #
def bits_to_symbols_oracle(width, data, order):
    n_syms = len(data) // width
    out = []
    i = 0
    for _ in range(n_syms):
        sym = 0
        if order == "MSBit":
            for b in range(width):
                sym = (sym << 1) | (1 if data[i] else 0)
                i += 1
        else:
            for b in range(width):
                sym >>= 1
                sym |= (1 << (width - 1)) if data[i] else 0
                i += 1
        out.append(sym)
    return np.array(out, np.uint8)


def symbols_to_bits_oracle(width, syms, order):
    out = []
    for s in syms:
        s = int(s)
        if order == "MSBit":
            for b in range(width):
                out.append(1 if (s & (1 << (width - 1))) else 0)
                s = (s << 1) & 0xFF
        else:
            for b in range(width):
                out.append(s & 1)
                s >>= 1
    return np.array(out, np.uint8)


def run_block_chain(blocks, data, labels=None):
    feed = FeederSource("uint8")
    feed.feed_buffer(np.asarray(data, np.uint8), labels)
    sink = CollectorSink("uint8")
    topo = Topology()
    chain = [feed] + blocks + [sink]
    for a, b in zip(chain[:-1], chain[1:]):
        topo.connect(a, 0, b, 0)
    topo.commit()
    assert topo.wait_inactive()
    return sink


@pytest.mark.parametrize("order", ["LSBit", "MSBit"])
@pytest.mark.parametrize("width", range(1, 9))
def test_pack_kernels_match_reference_loops(width, order):
    rng = np.random.default_rng(width)
    bits = rng.integers(0, 2, 24 * 8).astype(np.uint8)
    syms = bops.bits_to_symbols(bits, width, order)
    exp = bits_to_symbols_oracle(width, bits, order)
    assert_buffers_equal(exp, syms)
    back = bops.symbols_to_bits(syms, width, order)
    exp_bits = symbols_to_bits_oracle(width, syms, order)
    assert_buffers_equal(exp_bits, back)


@pytest.mark.parametrize("order", ["LSBit", "MSBit"])
@pytest.mark.parametrize("width", range(1, 9))
def test_bytes_symbols_roundtrip(width, order):
    rng = np.random.default_rng(width + 10)
    group = bops.group_bytes(width)
    data = rng.integers(0, 256, group * 8 * 3).astype(np.uint8)
    syms = bops.bytes_to_symbols(data, width, order)
    assert np.all(syms < (1 << width))
    back = bops.symbols_to_bytes(syms, width, order)
    assert_buffers_equal(data[: len(back)], back)


@pytest.mark.parametrize("order", ["LSBit", "MSBit"])
@pytest.mark.parametrize("width", range(1, 9))
def test_bit_symbol_block_roundtrip(width, order):
    # bits -> symbols -> bits identity (reference
    # TestSymbolBitConversions.cpp)
    rng = np.random.default_rng(width + 20)
    bits = rng.integers(0, 2, width * 50).astype(np.uint8)
    b2s = BlockRegistry.make("/comms/bits_to_symbols", width, order)
    s2b = BlockRegistry.make("/comms/symbols_to_bits", width, order)
    sink = run_block_chain([b2s, s2b], bits)
    assert_buffers_equal(bits, sink.get_buffer())


@pytest.mark.parametrize("order", ["LSBit", "MSBit"])
@pytest.mark.parametrize("width", range(1, 9))
def test_symbol_byte_block_roundtrip(width, order):
    # symbols -> bytes -> symbols identity (reference
    # TestSymbolByteConversions.cpp:27-54)
    rng = np.random.default_rng(width + 30)
    group = bops.group_symbols(width)
    syms = rng.integers(0, 1 << width, group * 24).astype(np.uint8)
    s2y = BlockRegistry.make("/comms/symbols_to_bytes", width, order)
    y2s = BlockRegistry.make("/comms/bytes_to_symbols", width, order)
    sink = run_block_chain([s2y, y2s], syms)
    assert_buffers_equal(syms, sink.get_buffer())


def test_three_stage_loop():
    # bits -> symbols -> bytes -> symbols -> bits
    # (reference TestSymbolByteConversions 3-stage loops)
    rng = np.random.default_rng(42)
    width, order = 3, "MSBit"
    bits = rng.integers(0, 2, 24 * 8).astype(np.uint8)
    b2s = BlockRegistry.make("/comms/bits_to_symbols", width, order)
    s2y = BlockRegistry.make("/comms/symbols_to_bytes", width, order)
    y2s = BlockRegistry.make("/comms/bytes_to_symbols", width, order)
    s2b = BlockRegistry.make("/comms/symbols_to_bits", width, order)
    sink = run_block_chain([b2s, s2y, y2s, s2b], bits)
    assert_buffers_equal(bits, sink.get_buffer())


def test_conversion_label_rescale():
    width = 4
    bits = np.ones(32, np.uint8)
    labels = [Label("mark", None, 8)]
    b2s = BlockRegistry.make("/comms/bits_to_symbols", width, "MSBit")
    sink = run_block_chain([b2s], bits, labels)
    got = sink.get_labels()
    assert got[0].index == 2  # 8 bits / 4 per symbol


def test_conversion_packet_mode():
    width = 2
    payload = np.array([1, 0, 1, 1, 0, 1, 0, 0], np.uint8)
    pkt = Packet(payload, labels=[Label("x", None, 4)])
    feed = FeederSource("uint8")
    feed.feed_packet(pkt)
    b2s = BlockRegistry.make("/comms/bits_to_symbols", width, "MSBit")
    sink = CollectorSink("uint8")
    topo = Topology()
    topo.connect(feed, 0, b2s, 0)
    topo.connect(b2s, 0, sink, 0)
    topo.commit()
    assert topo.wait_inactive()
    assert len(sink.packets) == 1
    out = sink.packets[0]
    assert_buffers_equal(
        bops.bits_to_symbols(payload, width, "MSBit"), out.payload
    )
    assert out.labels[0].index == 2


# ---------------------------------------------------------------------- #
# Mapper / slicer (reference: TestSymbolMapperSlicer.cpp)
# ---------------------------------------------------------------------- #
def test_mapper_slicer_roundtrip_bpsk():
    rng = np.random.default_rng(1)
    syms = rng.integers(0, 2, 100).astype(np.uint8)
    mapper = BlockRegistry.make("/comms/symbol_mapper", "float32")
    mapper.set_map([-1, 1])
    slicer = BlockRegistry.make("/comms/symbol_slicer", "float32")
    slicer.set_map([-1, 1])
    feed = FeederSource("uint8")
    feed.feed_buffer(syms)
    sink = CollectorSink("uint8")
    topo = Topology()
    topo.connect(feed, 0, mapper, 0)
    topo.connect(mapper, 0, slicer, 0)
    topo.connect(slicer, 0, sink, 0)
    topo.commit()
    assert topo.wait_inactive()
    assert_buffers_equal(syms, sink.get_buffer())


def test_mapper_slicer_qpsk_complex():
    rng = np.random.default_rng(2)
    qpsk = np.array([-1 - 1j, -1 + 1j, 1 + 1j, 1 - 1j])
    syms = rng.integers(0, 4, 128).astype(np.uint8)
    mapper = BlockRegistry.make("/comms/symbol_mapper", "complex_float32")
    mapper.set_map(qpsk)
    slicer = BlockRegistry.make("/comms/symbol_slicer", "complex_float32")
    slicer.set_map(qpsk)
    feed = FeederSource("uint8")
    feed.feed_buffer(syms)
    sink = CollectorSink("uint8")
    topo = Topology()
    topo.connect(feed, 0, mapper, 0)
    topo.connect(mapper, 0, slicer, 0)
    topo.connect(slicer, 0, sink, 0)
    topo.commit()
    assert topo.wait_inactive()
    assert_buffers_equal(syms, sink.get_buffer())


def test_mapper_validation():
    mapper = BlockRegistry.make("/comms/symbol_mapper", "float32")
    with pytest.raises(ValueError):
        mapper.set_map([])
    with pytest.raises(ValueError):
        mapper.set_map([1, 2, 3])  # not a power of two


# ---------------------------------------------------------------------- #
# Differential coding (reference: TestDifferentialCoding.cpp)
# ---------------------------------------------------------------------- #
@pytest.mark.parametrize("symbols", [2, 4, 8, 256])
def test_differential_roundtrip(symbols):
    rng = np.random.default_rng(symbols)
    data = rng.integers(0, symbols, 200).astype(np.uint8)
    enc = BlockRegistry.make("/comms/differential_encoder")
    enc.set_symbols(symbols)
    dec = BlockRegistry.make("/comms/differential_decoder")
    dec.set_symbols(symbols)
    sink = run_block_chain([enc, dec], data)
    assert_buffers_equal(data, sink.get_buffer())


def test_differential_encoder_oracle():
    data = np.array([1, 0, 1, 1, 1, 0], np.uint8)
    enc = BlockRegistry.make("/comms/differential_encoder")
    enc.set_symbols(2)
    sink = run_block_chain([enc], data)
    # reference loop: last = (in + last + N) % N
    last, exp = 0, []
    for v in data:
        last = (int(v) + last + 2) % 2
        exp.append(last)
    assert_buffers_equal(np.array(exp, np.uint8), sink.get_buffer())


def test_differential_state_across_chunks():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 4, 100).astype(np.uint8)
    enc = BlockRegistry.make("/comms/differential_encoder")
    enc.set_symbols(4)
    dec = BlockRegistry.make("/comms/differential_decoder")
    dec.set_symbols(4)
    feed = FeederSource("uint8")
    feed.feed_buffer(data[:33])
    feed.feed_buffer(data[33:66])
    feed.feed_buffer(data[66:])
    sink = CollectorSink("uint8")
    topo = Topology()
    topo.connect(feed, 0, enc, 0)
    topo.connect(enc, 0, dec, 0)
    topo.connect(dec, 0, sink, 0)
    topo.commit()
    assert topo.wait_inactive()
    assert_buffers_equal(data, sink.get_buffer())


# ---------------------------------------------------------------------- #
# Scrambler / descrambler (reference: digital/Scrambler.cpp)
# ---------------------------------------------------------------------- #
def lfsr_oracle(poly, seed, n):
    """Direct port of GLFSR_next (digital/lfsr.h:86-100)."""
    mask = 0
    p = poly
    for shift in range(63, -1, -1):
        if p & (1 << shift):
            mask = 1 << shift
            break
    data = seed
    full_poly = poly | 1
    out = []
    for _ in range(n):
        data = (data << 1) & ((1 << 64) - 1)
        if data & mask:
            data ^= full_poly
            out.append(1)
        else:
            out.append(0)
    return np.array(out, np.uint8)


def test_additive_scrambler_keystream_oracle():
    rng = np.random.default_rng(4)
    data = rng.integers(0, 2, 300).astype(np.uint8)
    scr = BlockRegistry.make("/comms/scrambler")
    scr.set_mode("additive")
    scr.set_poly(0x19)
    scr.set_seed(1)
    sink = run_block_chain([scr], data)
    ks = lfsr_oracle(0x19, 1, len(data))
    assert_buffers_equal(data ^ ks, sink.get_buffer())


@pytest.mark.parametrize("mode", ["additive", "multiplicative"])
@pytest.mark.parametrize("poly", [0x19, 0x83, 0x20001])  # incl. x^17+x^5+1-ish
def test_scrambler_descrambler_roundtrip(mode, poly):
    rng = np.random.default_rng(poly)
    data = rng.integers(0, 2, 400).astype(np.uint8)
    scr = BlockRegistry.make("/comms/scrambler")
    scr.set_mode(mode)
    scr.set_poly(poly)
    scr.set_seed(0x5A)
    dsc = BlockRegistry.make("/comms/descrambler")
    dsc.set_mode(mode)
    dsc.set_poly(poly)
    dsc.set_seed(0x5A)
    sink = run_block_chain([scr, dsc], data)
    out = sink.get_buffer()
    if mode == "additive":
        assert_buffers_equal(data, out)
    else:
        # multiplicative is self-synchronizing: after the register flushes
        # (64 bits max) the stream matches
        assert_buffers_equal(data[64:], out[64:])


def test_scrambler_validation():
    scr = BlockRegistry.make("/comms/scrambler")
    with pytest.raises(ValueError):
        scr.set_mode("bogus")
    with pytest.raises(ValueError):
        scr.set_sync("01x")
    with pytest.raises(ValueError):
        scr.set_sync("0" * 65)


# ---------------------------------------------------------------------- #
# Bitwise (reference: TestBitwise.cpp)
# ---------------------------------------------------------------------- #
def test_bitwise_unary_not():
    data = np.array([0x0F, 0xF0, 0xAA], np.uint8)
    feed = FeederSource("uint8")
    feed.feed_buffer(data)
    blk = BlockRegistry.make("/comms/bitwise_unary", "uint8", "NOT")
    sink = CollectorSink("uint8")
    topo = Topology()
    topo.connect(feed, 0, blk, 0)
    topo.connect(blk, 0, sink, 0)
    topo.commit()
    assert topo.wait_inactive()
    assert_buffers_equal(~data, sink.get_buffer())


@pytest.mark.parametrize("op,fcn", [("AND", np.bitwise_and),
                                    ("OR", np.bitwise_or),
                                    ("XOR", np.bitwise_xor)])
def test_bitwise_binary_three_port(op, fcn):
    rng = np.random.default_rng(5)
    a, b, c = (rng.integers(0, 1 << 15, 64).astype(np.int16) for _ in range(3))
    blk = BlockRegistry.make("/comms/bitwise_binary", "int16", op, 3)
    feeds = []
    topo = Topology()
    for i, arr in enumerate((a, b, c)):
        f = FeederSource("int16")
        f.feed_buffer(arr)
        topo.connect(f, 0, blk, i)
        feeds.append(f)
    sink = CollectorSink("int16")
    topo.connect(blk, 0, sink, 0)
    topo.commit()
    assert topo.wait_inactive()
    assert_buffers_equal(fcn(fcn(a, b), c), sink.get_buffer())


def test_const_bitwise_and_bitshift():
    data = np.arange(16, dtype=np.uint16)
    blk = BlockRegistry.make("/comms/const_bitwise_binary", "uint16", 0x3, "AND")
    feed = FeederSource("uint16")
    feed.feed_buffer(data)
    sink = CollectorSink("uint16")
    topo = Topology()
    topo.connect(feed, 0, blk, 0)
    topo.connect(blk, 0, sink, 0)
    topo.commit()
    assert topo.wait_inactive()
    assert_buffers_equal(data & 0x3, sink.get_buffer())

    sh = BlockRegistry.make("/comms/bitshift", "uint16", "LEFTSHIFT", 3)
    feed2 = FeederSource("uint16")
    feed2.feed_buffer(data)
    sink2 = CollectorSink("uint16")
    topo2 = Topology()
    topo2.connect(feed2, 0, sh, 0)
    topo2.connect(sh, 0, sink2, 0)
    topo2.commit()
    assert topo2.wait_inactive()
    assert_buffers_equal((data << 3).astype(np.uint16), sink2.get_buffer())

    with pytest.raises(ValueError):
        BlockRegistry.make("/comms/bitshift", "uint16", "LEFTSHIFT", 16)
    with pytest.raises(ValueError):
        BlockRegistry.make("/comms/bitwise_binary", "float32", "AND", 2)


def test_arithmetic_right_shift_signed():
    data = np.array([-64, -8, 8, 64], np.int8)
    sh = BlockRegistry.make("/comms/bitshift", "int8", "RIGHTSHIFT", 2)
    feed = FeederSource("int8")
    feed.feed_buffer(data)
    sink = CollectorSink("int8")
    topo = Topology()
    topo.connect(feed, 0, sh, 0)
    topo.connect(sh, 0, sink, 0)
    topo.commit()
    assert topo.wait_inactive()
    assert_buffers_equal(data >> 2, sink.get_buffer())


# ---------------------------------------------------------------------- #
# Byte order (reference: TestByteOrder.cpp)
# ---------------------------------------------------------------------- #
@pytest.mark.parametrize("dtype,np_dtype", [("uint16", np.uint16),
                                            ("uint32", np.uint32),
                                            ("int64", np.int64),
                                            ("float32", np.float32),
                                            ("float64", np.float64)])
def test_byte_order_swap(dtype, np_dtype):
    rng = np.random.default_rng(6)
    if np.issubdtype(np_dtype, np.floating):
        data = rng.normal(size=32).astype(np_dtype)
    else:
        data = rng.integers(0, 1 << 15, 32).astype(np_dtype)
    blk = BlockRegistry.make("/comms/byte_order", dtype)
    blk.set_byte_order("Swap Order")
    feed = FeederSource(dtype)
    feed.feed_buffer(data)
    sink = CollectorSink(dtype)
    topo = Topology()
    topo.connect(feed, 0, blk, 0)
    topo.connect(blk, 0, sink, 0)
    topo.commit()
    assert topo.wait_inactive()
    assert_buffers_equal(data.byteswap(), sink.get_buffer())


def test_byte_order_host_modes():
    data = np.arange(8, dtype=np.uint32)
    blk = BlockRegistry.make("/comms/byte_order", "uint32")
    # on a little-endian host, Little Endian mode is a no-op
    blk.set_byte_order("Little Endian")
    feed = FeederSource("uint32")
    feed.feed_buffer(data)
    sink = CollectorSink("uint32")
    topo = Topology()
    topo.connect(feed, 0, blk, 0)
    topo.connect(blk, 0, sink, 0)
    topo.commit()
    assert topo.wait_inactive()
    import sys as _sys
    exp = data if _sys.byteorder == "little" else data.byteswap()
    assert_buffers_equal(exp, sink.get_buffer())

    with pytest.raises(ValueError):
        blk.set_byte_order("bogus")
    with pytest.raises(ValueError):
        BlockRegistry.make("/comms/byte_order", "uint8")


def test_byte_order_roundtrip_complex():
    rng = np.random.default_rng(7)
    data = (rng.normal(size=16) + 1j * rng.normal(size=16)).astype(np.complex64)
    blk1 = BlockRegistry.make("/comms/byte_order", "complex_float32")
    blk2 = BlockRegistry.make("/comms/byte_order", "complex_float32")
    feed = FeederSource("complex_float32")
    feed.feed_buffer(data)
    sink = CollectorSink("complex_float32")
    topo = Topology()
    topo.connect(feed, 0, blk1, 0)
    topo.connect(blk1, 0, blk2, 0)
    topo.connect(blk2, 0, sink, 0)
    topo.commit()
    assert topo.wait_inactive()
    assert_buffers_equal(data, sink.get_buffer())


# ---------------------------------------------------------------------- #
# Native C++ kernels vs Python fallbacks
# ---------------------------------------------------------------------- #
def test_native_lfsr_matches_python():
    from pothoscomms_tpu import native
    from pothoscomms_tpu.blocks.digital import GaloisLFSR

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(12)
    for poly, seed in [(0x19, 1), (0x20001, 0x5A), (0x83, 0xFFFF)]:
        nat = native.NativeLfsr(poly, seed)
        py = GaloisLFSR(poly, seed)
        assert_buffers_equal(py.keystream(500), nat.keystream(500))
        bits = rng.integers(0, 2, 300).astype(np.uint8)
        nat2 = native.NativeLfsr(poly, seed)
        py2 = GaloisLFSR(poly, seed)
        assert_buffers_equal(py2.scramble_mult(bits), nat2.scramble_mult(bits))
        nat3 = native.NativeLfsr(poly, seed)
        py3 = GaloisLFSR(poly, seed)
        assert_buffers_equal(py3.descramble_mult(bits),
                             nat3.descramble_mult(bits))


def test_native_crc8_matches_python():
    from pothoscomms_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(13)
    for n in (1, 7, 100, 1000):
        data = rng.integers(0, 256, n).astype(np.uint8)
        crc = 0
        for b in data:
            crc ^= int(b) << 8
            for _ in range(8):
                if crc & 0x8000:
                    crc ^= 0x1070 << 3
                crc = (crc << 1) & 0xFFFFFF
        assert native.crc8(data) == (crc >> 8) & 0xFF
