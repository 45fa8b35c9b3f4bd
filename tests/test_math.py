"""Math block tests — dtype-sweep golden tests mirroring the reference's
math/TestArithmeticBlocks.cpp / TestScale / TestComparatorBlocks patterns:
feeder → block → collector topologies with expectations computed per dtype
(signed/unsigned/complex aware), buffers sized to exercise vector paths.
"""

import numpy as np
import pytest

from pothoscomms_tpu import BlockRegistry, Topology
from pothoscomms_tpu.core.dtypes import (
    ALL_NAMES,
    COMPLEX_NAMES,
    DType,
    FLOAT_NAMES,
    SCALAR_NAMES,
)
from pothoscomms_tpu.core.fixtures import CollectorSink, FeederSource
from pothoscomms_tpu.core.testing import (
    assert_buffers_close,
    assert_buffers_equal,
    from_complex_int,
    to_complex_int,
)

N = 128  # ≥100 so vectorized paths execute (reference stretch pattern)


def make_test_data(dtype: DType, rng, lo=1, hi=50, allow_zero=False):
    """Random data in the dtype's storage representation + numpy compute rep."""
    lo_eff = lo if allow_zero else max(lo, 1)
    if dtype.is_complex:
        re = rng.integers(lo_eff, hi, N).astype(np.float64)
        im = rng.integers(lo_eff, hi, N).astype(np.float64)
        vals = re + 1j * im
        if dtype.is_complex_int:
            return to_complex_int(vals, dtype), vals
        return vals.astype(dtype.np), vals.astype(dtype.np)
    if dtype.is_float:
        vals = (rng.uniform(lo_eff, hi, N)).astype(dtype.np)
        return vals, vals
    vals = rng.integers(lo_eff, hi, N).astype(dtype.np)
    return vals, vals


def run_block(block, inputs, in_dtype, out_dtype=None):
    """feeder(s) → block → collector; returns collected buffer."""
    out_dtype = out_dtype or in_dtype
    topo = Topology()
    feeders = []
    for i, arr in enumerate(inputs):
        f = FeederSource(in_dtype)
        f.feed_buffer(arr)
        topo.connect(f, 0, block, i)
        feeders.append(f)
    collector = CollectorSink(out_dtype)
    topo.connect(block, 0, collector, 0)
    assert topo.wait_inactive(timeout=30)
    return collector.get_buffer()


def c_trunc_div(a, b):
    if a.dtype.kind in "iu":
        q = np.trunc(a.astype(np.float64) / b.astype(np.float64))
        return q.astype(a.dtype)
    return a / b


def cplx_int_ref(op, x_store, y_store):
    """numpy oracle for std::complex<intN> arithmetic with C++ integer
    promotion: sub-int widths evaluate in int32, int32/64 in-type, results
    narrowed once on assignment (libstdc++ operator shapes)."""
    st = x_store.dtype

    def promote(a):
        return a.astype(np.int32) if a.dtype.itemsize < 4 else a

    xr, xi_ = promote(x_store[:, 0]), promote(x_store[:, 1])
    yr, yi_ = promote(y_store[:, 0]), promote(y_store[:, 1])

    def tdiv(a, b):
        b = np.where(b == 0, np.ones_like(b), b)

        def one(x, y):
            x, y = int(x), int(y)
            q = abs(x) // abs(y)
            return q if (x < 0) == (y < 0) else -q

        return np.array([one(x, y) for x, y in zip(a, b)], dtype=a.dtype)

    if op == "ADD":
        return x_store + y_store
    if op == "SUB":
        return x_store - y_store
    if op == "MUL":
        return np.stack(
            [(xr * yr - xi_ * yi_).astype(st), (xr * yi_ + xi_ * yr).astype(st)], -1
        )
    n = (yr * yr + yi_ * yi_).astype(st)
    n_p = promote(n)
    return np.stack(
        [tdiv(xr * yr + xi_ * yi_, n_p).astype(st), tdiv(xi_ * yr - xr * yi_, n_p).astype(st)],
        -1,
    )


@pytest.mark.parametrize("dtype_name", ALL_NAMES)
@pytest.mark.parametrize("op", ["ADD", "SUB", "MUL", "DIV"])
def test_arithmetic_dtype_sweep(dtype_name, op):
    dt = DType.parse(dtype_name)
    rng = np.random.default_rng(hash((dtype_name, op)) % 2**32)
    x_store, x = make_test_data(dt, rng, 20, 50)
    y_store, y = make_test_data(dt, rng, 1, 19)

    blk = BlockRegistry.make("/comms/arithmetic", dtype_name, op)
    got = run_block(blk, [x_store, y_store], dtype_name)

    if dt.is_complex_int:
        exp = cplx_int_ref(op, x_store, y_store)
        assert_buffers_equal(exp, got)
        return

    if op == "ADD":
        exp = x + y
    elif op == "SUB":
        exp = x - y  # may wrap for unsigned; numpy wraps identically
    elif op == "MUL":
        exp = x * y
    else:
        exp = c_trunc_div(x, y)
    if dt.is_float:
        assert_buffers_close(exp, got, 1e-4 if dt.bits == 32 else 1e-12)
    else:
        assert_buffers_equal(exp, got)


def test_arithmetic_three_inputs_and_preload():
    blk = BlockRegistry.make("/comms/arithmetic", "int32", "ADD")
    blk.set_num_inputs(3)
    x = np.arange(N, dtype=np.int32)
    y = np.arange(N, dtype=np.int32) * 2
    z = np.arange(N, dtype=np.int32) * 3
    got = run_block(blk, [x, y, z], "int32")
    assert_buffers_equal(x + y + z, got)

    # preload: port 1 padded with zeros (feedback-loop support)
    blk2 = BlockRegistry.make("/comms/arithmetic", "int32", "ADD")
    blk2.set_preload([0, 4])
    topo = Topology()
    f0, f1 = FeederSource("int32"), FeederSource("int32")
    f0.feed_buffer(x)
    f1.feed_buffer(y[: N - 4])
    c = CollectorSink("int32")
    topo.connect(f0, 0, blk2, 0)
    topo.connect(f1, 0, blk2, 1)
    topo.connect(blk2, 0, c, 0)
    assert topo.wait_inactive()
    exp = x + np.concatenate([np.zeros(4, np.int32), y[: N - 4]])
    assert_buffers_equal(exp, c.get_buffer())


def test_arithmetic_inline_buffers():
    """Output genuinely aliases input 0's device buffer via XLA donation
    (reference asserts real inlining, math/TestArithmeticBlocks.cpp:381-383)."""
    blk = BlockRegistry.make("/comms/arithmetic", "float32", "ADD")
    x = np.arange(N, dtype=np.float32)
    y = np.ones(N, dtype=np.float32)
    got = run_block(blk, [x, y], "float32")
    assert_buffers_close(x + y, got, 1e-6)
    assert blk.get_num_inline_buffers() > 0


@pytest.mark.parametrize("dtype_name", ["float32", "float64", "int16", "uint8", "complex_float32", "complex_int16"])
@pytest.mark.parametrize("op", ["X+K", "X-K", "K-X", "X*K", "X/K", "K/X"])
def test_const_arithmetic(dtype_name, op):
    dt = DType.parse(dtype_name)
    rng = np.random.default_rng(42)
    x_store, x = make_test_data(dt, rng, 2, 40)
    k = (3 + 2j) if dt.is_complex else 3
    blk = BlockRegistry.make("/comms/const_arithmetic", dtype_name, op, k)
    got = run_block(blk, [x_store], dtype_name)

    if dt.is_complex_int:
        k_store = np.broadcast_to(
            to_complex_int(np.full(N, complex(k)), dt), x_store.shape
        )
        opmap = {"X+K": ("ADD", x_store, k_store), "X-K": ("SUB", x_store, k_store),
                 "K-X": ("SUB", k_store, x_store), "X*K": ("MUL", x_store, k_store),
                 "X/K": ("DIV", x_store, k_store), "K/X": ("DIV", k_store, x_store)}
        base, a, b = opmap[op]
        exp = cplx_int_ref(base, np.ascontiguousarray(a), np.ascontiguousarray(b))
        assert_buffers_equal(exp, got)
        return

    karr = np.asarray(k, dtype=x.dtype)
    if op == "X+K":
        exp = x + karr
    elif op == "X-K":
        exp = x - karr
    elif op == "K-X":
        exp = karr - x
    elif op == "X*K":
        exp = x * karr
    elif op == "X/K":
        exp = c_trunc_div(x, np.broadcast_to(karr, x.shape))
    else:
        exp = c_trunc_div(np.broadcast_to(karr, x.shape), x)
    if dt.is_float:
        assert_buffers_close(exp, got, 1e-5)
    else:
        assert_buffers_equal(exp, got)


def test_scale_float_and_fixed_point():
    # float path
    x = np.linspace(-4, 4, N).astype(np.float32)
    blk = BlockRegistry.make("/comms/scale", "float32")
    blk.set_factor(2.5)
    got = run_block(blk, [x], "float32")
    assert_buffers_close(x * np.float32(2.5), got, 1e-6)

    # int16 Q-format: factor scaled by 2^16, product >> 16
    xi = np.arange(-64, 64, dtype=np.int16)
    blk = BlockRegistry.make("/comms/scale", "int16")
    blk.set_factor(0.5)
    got = run_block(blk, [xi], "int16")
    fq = int(np.trunc(0.5 * 2**16))
    exp = ((xi.astype(np.int32) * fq) >> 16).astype(np.int16)
    assert_buffers_equal(exp, got)


def test_scale_label_driven_factor():
    # a factor label mid-stream must land sample-accurately
    # (reference math/Scale.cpp:104-122)
    from pothoscomms_tpu.core.labels import Label

    x = np.ones(100, dtype=np.float32)
    feeder = FeederSource("float32")
    feeder.feed_buffer(x, [Label("gain", 3.0, 0), Label("gain", 5.0, 60)])
    blk = BlockRegistry.make("/comms/scale", "float32")
    blk.set_factor(1.0)
    blk.set_label_id("gain")
    coll = CollectorSink("float32")
    topo = Topology()
    topo.connect(feeder, 0, blk, 0)
    topo.connect(blk, 0, coll, 0)
    assert topo.wait_inactive()
    exp = np.concatenate([np.full(60, 3.0), np.full(40, 5.0)]).astype(np.float32)
    assert_buffers_close(exp, coll.get_buffer(), 1e-6)


def test_rotate_complex_float_and_int():
    phase = 0.3
    x = (np.random.default_rng(0).normal(size=N) + 1j * np.random.default_rng(1).normal(size=N)).astype(np.complex64)
    blk = BlockRegistry.make("/comms/rotate", "complex_float32")
    blk.set_phase(phase)
    got = run_block(blk, [x], "complex_float32")
    assert_buffers_close(x * np.exp(1j * phase).astype(np.complex64), got, 1e-5)

    # int16: phasor in Q(int32), product >> 16 per component
    xi = to_complex_int((np.arange(N) % 40 - 20) + 1j * (np.arange(N) % 30 - 15), "complex_int16")
    blk = BlockRegistry.make("/comms/rotate", "complex_int16")
    blk.set_phase(phase)
    got = run_block(blk, [xi], "complex_int16")
    ph = np.exp(1j * phase)
    pr = int(np.trunc(ph.real * 2**16))
    pi = int(np.trunc(ph.imag * 2**16))
    re = xi[:, 0].astype(np.int32)
    im = xi[:, 1].astype(np.int32)
    out_re = ((re * pr - im * pi) >> 16).astype(np.int16)
    out_im = ((re * pi + im * pr) >> 16).astype(np.int16)
    assert_buffers_equal(np.stack([out_re, out_im], -1), got)


@pytest.mark.parametrize("op", [">", "<", ">=", "<=", "==", "!="])
def test_comparator_and_const_comparator(op):
    rng = np.random.default_rng(5)
    x = rng.integers(0, 10, N).astype(np.int32)
    y = rng.integers(0, 10, N).astype(np.int32)
    blk = BlockRegistry.make("/comms/comparator", "int32", op)
    got = run_block(blk, [x, y], "int32", out_dtype="int8")
    exp = {
        ">": x > y, "<": x < y, ">=": x >= y, "<=": x <= y, "==": x == y, "!=": x != y,
    }[op].astype(np.int8)
    assert_buffers_equal(exp, got)

    blk = BlockRegistry.make("/comms/const_comparator", "int32", op, 5)
    got = run_block(blk, [x], "int32", out_dtype="int8")
    k = np.int32(5)
    exp = {
        ">": x > k, "<": x < k, ">=": x >= k, "<=": x <= k, "==": x == k, "!=": x != k,
    }[op].astype(np.int8)
    assert_buffers_equal(exp, got)


def test_abs_variants():
    x = np.linspace(-5, 5, N).astype(np.float32)
    got = run_block(BlockRegistry.make("/comms/abs", "float32"), [x], "float32")
    assert_buffers_close(np.abs(x), got, 1e-6)

    xi = (np.arange(N) - 64).astype(np.int16)
    got = run_block(BlockRegistry.make("/comms/abs", "int16"), [xi], "int16")
    assert_buffers_equal(np.abs(xi), got)

    xc = (np.linspace(-3, 3, N) + 1j * np.linspace(2, -2, N)).astype(np.complex64)
    got = run_block(
        BlockRegistry.make("/comms/abs", "complex_float32"), [xc], "complex_float32", "float32"
    )
    assert_buffers_close(np.abs(xc), got, 1e-5)

    # fixed-point complex: sqrt(float(re^2+im^2)) truncated
    ci = to_complex_int((np.arange(N) % 20 - 10) + 1j * (np.arange(N) % 14 - 7), "complex_int16")
    got = run_block(
        BlockRegistry.make("/comms/abs", "complex_int16"), [ci], "complex_int16", "int16"
    )
    mag2 = (ci[:, 0].astype(np.int32) ** 2 + ci[:, 1].astype(np.int32) ** 2).astype(np.float32)
    exp = np.sqrt(mag2).astype(np.int16)
    assert_buffers_equal(exp, got)


def test_angle_float_and_fxpt_parity():
    xc = (np.cos(np.linspace(0, 6, N)) + 1j * np.sin(np.linspace(0, 6, N))).astype(np.complex64)
    got = run_block(
        BlockRegistry.make("/comms/angle", "complex_float32"), [xc], "complex_float32", "float32"
    )
    assert_buffers_close(np.angle(xc), got, 1e-5)


def _fxpt_atan2_scalar(y, x):
    """Direct scalar port of the reference algorithm (oracle for the
    vectorized kernel): functions/fxpt_atan2.cpp:108-138."""

    def nabs(j):
        return j if j < 0 else -j

    def q15mul(j, k):
        inter = np.int64(j) * np.int64(k)
        add = 0 if (inter & 0x7FFF) == 0x4000 else 0x4000
        return int(np.int16((inter + add) >> 15))

    def q15div(n, d):
        return int(np.int16(int(np.int64(n) << 15) // d if (n < 0) == (d < 0) or n == 0 else -((-np.int64(n) << 15) // d if n < 0 else -(np.int64(n) << 15) // -d)))

    # simpler: C division truncates toward zero
    def cdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a < 0) == (b < 0) else -q

    def q15div2(n, d):
        return int(np.int16(cdiv(int(n) << 15, int(d))))

    if x == y:
        return 8192 if y > 0 else (40960 if y < 0 else 0)
    nabs_y, nabs_x = nabs(y), nabs(x)
    if nabs_x < nabs_y:
        yox = q15div2(y, x)
        corr = q15mul(2847, nabs(yox))
        unrot = q15mul(np.int16(11039 + corr), yox)
        return np.uint16(unrot & 0xFFFF) if x > 0 else np.uint16((32768 + unrot) & 0xFFFF)
    else:
        xoy = q15div2(x, y)
        corr = q15mul(2847, nabs(xoy))
        unrot = q15mul(np.int16(11039 + corr), xoy)
        return np.uint16((16384 - unrot) & 0xFFFF) if y > 0 else np.uint16((49152 - unrot) & 0xFFFF)


def test_fxpt_atan2_grid_parity():
    from pothoscomms_tpu.ops.fxpt import fxpt_atan2

    rng = np.random.default_rng(3)
    ys = rng.integers(-32768, 32768, 512).astype(np.int16)
    xs = rng.integers(-32768, 32768, 512).astype(np.int16)
    # include axis/special cases
    specials = np.array(
        [[0, 0], [1, 1], [-5, -5], [100, 0], [0, 100], [-100, 0], [0, -100]],
        dtype=np.int16,
    )
    ys = np.concatenate([ys, specials[:, 0]])
    xs = np.concatenate([xs, specials[:, 1]])
    got = np.asarray(fxpt_atan2(ys, xs))
    exp = np.array([_fxpt_atan2_scalar(int(y), int(x)) for y, x in zip(ys, xs)], np.uint16)
    np.testing.assert_array_equal(got, exp)

    # sanity: angles land within ~1 deg of the float atan2
    mask = (np.abs(xs.astype(int)) + np.abs(ys.astype(int))) > 100
    turns = got[mask].astype(np.float64) / 65536.0 * 2 * np.pi
    ref = np.mod(np.arctan2(ys[mask].astype(float), xs[mask].astype(float)), 2 * np.pi)
    err = np.abs(np.mod(turns - ref + np.pi, 2 * np.pi) - np.pi)
    assert err.max() < 0.02


def test_angle_fxpt_block():
    vals = (np.array([100, -50, 0, 77]) + 1j * np.array([30, 60, -90, 0]))
    ci = to_complex_int(vals, "complex_int16")
    got = run_block(
        BlockRegistry.make("/comms/angle", "complex_int16"), [ci], "complex_int16", "int16"
    )
    exp = np.array(
        [np.int16(_fxpt_atan2_scalar(int(v.imag), int(v.real))) for v in vals]
    )
    assert_buffers_equal(exp, got)


def test_conjugate():
    xc = (np.arange(N) + 1j * np.arange(N)).astype(np.complex64)
    got = run_block(BlockRegistry.make("/comms/conjugate", "complex_float32"), [xc], "complex_float32")
    assert_buffers_equal(np.conj(xc), got)
    ci = to_complex_int(np.arange(N) + 1j * np.arange(N), "complex_int32")
    got = run_block(BlockRegistry.make("/comms/conjugate", "complex_int32"), [ci], "complex_int32")
    assert_buffers_equal(np.stack([ci[:, 0], -ci[:, 1]], -1), got)


@pytest.mark.parametrize("dtype_name", FLOAT_NAMES)
def test_unary_float_blocks(dtype_name):
    dt = DType.parse(dtype_name)
    x = np.linspace(0.1, 4.0, N).astype(dt.np)
    eps = 1e-5 if dt.bits == 32 else 1e-11
    cases = {
        "/comms/sinc": np.where(np.abs(x) < 1e-6, 1.0, np.sin(x) / x),
        "/comms/sigmoid": 1 / (1 + np.exp(-x)),
        "/comms/log": np.log(x),
        "/comms/log2": np.log2(x),
        "/comms/log10": np.log10(x),
        "/comms/log1p": np.log1p(x),
        "/comms/exp": np.exp(x),
        "/comms/exp2": np.exp2(x),
        "/comms/exp10": np.power(10.0, x),
        "/comms/expm1": np.expm1(x),
        "/comms/sqrt": np.sqrt(x),
        "/comms/cbrt": np.cbrt(x),
        "/comms/erf": np.vectorize(float)(np.array([__import__("math").erf(v) for v in x])),
        "/comms/erfc": np.array([__import__("math").erfc(v) for v in x]),
        "/comms/gamma": np.array([__import__("math").gamma(v) for v in x]),
        "/comms/lngamma": np.array([__import__("math").lgamma(v) for v in x]),
    }
    for path, exp in cases.items():
        got = run_block(BlockRegistry.make(path, dtype_name), [x], dtype_name)
        rel = np.maximum(np.abs(exp), 1.0)
        assert np.max(np.abs(got - exp) / rel) < eps * 50, path


def test_rsqrt_fast_inverse_parity():
    # float32 path must match the Quake-style approximation bit-for-bit math
    x = np.linspace(0.5, 100, N).astype(np.float32)
    got = run_block(BlockRegistry.make("/comms/rsqrt", "float32"), [x], "float32")

    u = x.view(np.uint32)
    u2 = (np.uint32(0x5F1FFFF9) - (u >> np.uint32(1))).astype(np.uint32)
    f2 = u2.view(np.float32)
    exp = np.float32(0.703952253) * f2 * (np.float32(2.38924456) - x * f2 * f2)
    assert_buffers_close(exp, got, 1e-6)

    x64 = np.linspace(0.5, 100, N).astype(np.float64)
    got = run_block(BlockRegistry.make("/comms/rsqrt", "float64"), [x64], "float64")
    assert_buffers_close(1 / np.sqrt(x64), got, 1e-12)


def test_trigonometric_ops():
    x = np.linspace(0.2, 0.9, N).astype(np.float64)
    cases = {
        "SIN": np.sin(x), "COS": np.cos(x), "TAN": np.tan(x),
        "SEC": 1 / np.cos(x), "CSC": 1 / np.sin(x), "COT": 1 / np.tan(x),
        "ASIN": np.arcsin(x), "ACOS": np.arccos(x), "ATAN": np.arctan(x),
        "ASEC": np.arccos(1 / (x + 1)), "SINH": np.sinh(x), "COSH": np.cosh(x),
        "TANH": np.tanh(x), "ASINH": np.arcsinh(x), "ATANH": np.arctanh(x),
        "ACOTH": np.arctanh(1 / (x + 1)),
    }
    for op, exp in cases.items():
        xin = x + 1 if op in ("ASEC", "ACOTH") else x
        got = run_block(BlockRegistry.make("/comms/trigonometric", "float64", op), [xin], "float64")
        assert_buffers_close(exp, got, 1e-10)


def test_pow_and_roots():
    x = np.linspace(1, 5, N).astype(np.float64)
    blk = BlockRegistry.make("/comms/pow", "float64", 2.5)
    got = run_block(blk, [x], "float64")
    assert_buffers_close(x**2.5, got, 1e-10)

    xi = np.arange(1, N + 1, dtype=np.int32)
    blk = BlockRegistry.make("/comms/pow", "int32", 2)
    got = run_block(blk, [xi], "int32")
    assert_buffers_equal((xi.astype(np.float64) ** 2).astype(np.int32), got)

    blk = BlockRegistry.make("/comms/nth_root", "float64", 3.0)
    got = run_block(blk, [x], "float64")
    assert_buffers_close(x ** (1 / 3), got, 1e-10)


def test_modf_two_outputs():
    x = np.array([1.25, -2.75, 3.0, -0.5] * 32, dtype=np.float64)
    blk = BlockRegistry.make("/comms/modf", "float64")
    topo = Topology()
    f = FeederSource("float64")
    f.feed_buffer(x)
    ci, cf = CollectorSink("float64"), CollectorSink("float64")
    topo.connect(f, 0, blk, 0)
    topo.connect(blk, "int", ci, 0)
    topo.connect(blk, "frac", cf, 0)
    assert topo.wait_inactive()
    frac_exp, int_exp = np.modf(x)
    assert_buffers_close(int_exp, ci.get_buffer(), 1e-12)
    assert_buffers_close(frac_exp, cf.get_buffer(), 1e-12)


def test_beta():
    x = np.linspace(1, 4, N).astype(np.float64)
    y = np.linspace(2, 5, N).astype(np.float64)
    blk = BlockRegistry.make("/comms/beta", "float64")
    got = run_block(blk, [x, y], "float64")
    import math

    exp = np.array([math.gamma(a) * math.gamma(b) / math.gamma(a + b) for a, b in zip(x, y)])
    assert_buffers_close(exp, got, 1e-9)
