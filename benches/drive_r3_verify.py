"""Round-3 verify drive: exercise the ADVICE-fixed paths on the real chip.

1. Canonical scale topology (byte-sized edge capacities in effect).
2. fir_fft_chain with nbins=64 < 128 — must take the combined-operator
   dispatch (adaptive prev_pad) and match the convolution oracle.
3. complex_float64 FIR — must route to the host CPU backend at full
   fidelity (no f32 downcast).
"""
import numpy as np
import jax
import jax.numpy as jnp

from pothoscomms_tpu import BlockRegistry, Topology
from pothoscomms_tpu.core.fixtures import FeederSource, CollectorSink
from pothoscomms_tpu.parallel import cplx
from pothoscomms_tpu.parallel.chain import fir_fft_chain

print("backend:", jax.default_backend(), jax.devices())

# 1. canonical drive
feed = FeederSource("float32")
feed.feed_buffer(np.arange(1000, dtype=np.float32))
blk = BlockRegistry.make("/comms/scale", "float32")
blk.set_factor(2.5)
sink = CollectorSink("float32")
topo = Topology()
topo.connect(feed, 0, blk, 0)
topo.connect(blk, 0, sink, 0)
topo.commit()
assert topo.wait_inactive()
out = sink.get_buffer()
np.testing.assert_allclose(out, np.arange(1000) * 2.5, rtol=1e-6)
cap = blk.input(0).capacity
print("1. canonical scale drive OK; f32 edge capacity =", cap)
assert cap == (4 << 20) // 4

# 2. small-nbins combined dispatch on chip
rng = np.random.default_rng(51)
C, T, K, NB = 8, 8192, 33, 64
taps = (rng.normal(size=K) + 1j * rng.normal(size=K)) / K
run, hist0 = fir_fft_chain(taps, NB, C, T)
x = rng.normal(size=(C, T)) + 1j * rng.normal(size=(C, T))
spec, hist = run(jnp.asarray(cplx.to_planar(x).astype(np.float32)), hist0)
spec = np.asarray(spec)
y0 = np.convolve(x[0], taps, mode="full")[:T]
for w in (0, 1, T // NB - 1):
    exp = np.fft.fft(y0[w * NB: (w + 1) * NB])
    got = cplx.from_planar(spec[0, w])
    np.testing.assert_allclose(got, exp, atol=2e-2)
print("2. small-nbins combined chain OK on", jax.default_backend())

# 3. complex_float64 FIR stays on host at full fidelity
fir = BlockRegistry.make("/comms/fir_filter", "complex_float64", "COMPLEX")
ctaps = (rng.normal(size=15) + 1j * rng.normal(size=15)) / 15
fir.set_taps(ctaps)
feed2 = FeederSource("complex_float64")
xin = (rng.normal(size=4096) + 1j * rng.normal(size=4096))
feed2.feed_buffer(xin.astype(np.complex128))
sink2 = CollectorSink("complex_float64")
t2 = Topology()
t2.connect(feed2, 0, fir, 0)
t2.connect(fir, 0, sink2, 0)
t2.commit()
assert t2.wait_inactive()
got = sink2.get_buffer()
exp = np.convolve(xin, ctaps, mode="full")[14:14 + len(got)]
np.testing.assert_allclose(got, exp, atol=1e-9)  # f64 fidelity: tight tol
print("3. complex128 FIR host-fidelity OK (atol 1e-9)")
print("ALL DRIVES PASSED")
