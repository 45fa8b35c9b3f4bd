"""Worker for the two-process jax.distributed test (SURVEY.md §4 item 9).

Each process owns 4 virtual CPU devices; the two processes form one
8-device global mesh via jax.distributed. The channel-sharded FIR+FFT
chain runs over the global mesh; every process checks its addressable
output shards against a locally computed single-device reference.

Usage: distributed_worker.py <rank> <num_processes> <port>
"""

import os
import sys

rank = int(sys.argv[1])
nprocs = int(sys.argv[2])
port = int(sys.argv[3])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from pothoscomms_tpu.parallel.distributed import (  # noqa: E402
    initialize,
    make_global_mesh,
)
from pothoscomms_tpu.parallel.mesh import channel_sharded_fir_fft  # noqa: E402
from pothoscomms_tpu.parallel.chain import fir_fft_chain  # noqa: E402

initialize(f"localhost:{port}", num_processes=nprocs, process_id=rank)

assert jax.process_count() == nprocs, jax.process_count()
assert len(jax.local_devices()) == 4
assert len(jax.devices()) == 4 * nprocs

C, T, K, NBINS = 16, 2048, 16, 256
rng = np.random.default_rng(42)  # same seed everywhere: same global data
taps = (rng.normal(size=K) + 1j * rng.normal(size=K)) / K
x_np = rng.normal(size=(C, T, 2)).astype(np.float32)

mesh = make_global_mesh("ch")
run, init_history = channel_sharded_fir_fft(mesh, taps, NBINS)

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sh_x = NamedSharding(mesh, P("ch"))
x = jax.make_array_from_callback(x_np.shape, sh_x,
                                 lambda idx: x_np[idx])
h_np = np.zeros((C, K - 1, 2), np.float32)
h = jax.make_array_from_callback(h_np.shape, sh_x,
                                 lambda idx: h_np[idx])

spec, hist = run(x, h)

# local single-device reference (same formulation) for the shards
run_ref, _ = fir_fft_chain(taps, NBINS, C, T)
ref_spec, ref_hist = run_ref(jnp.asarray(x_np), jnp.asarray(h_np))
ref_spec = np.asarray(ref_spec)

checked = 0
for shard in spec.addressable_shards:
    got = np.asarray(shard.data)
    sl = shard.index
    exp = ref_spec[sl]
    np.testing.assert_allclose(got, exp, atol=1e-4)
    checked += got.size

assert checked > 0
print(f"WORKER{rank} OK checked={checked}", flush=True)
