"""On-chip probe: blocked state-space IIR core vs per-sample lax.scan
(VERDICT r3 next #4 — done bar: parity green + committed probe JSON
with both timings).

Timing discipline per the relay rules (memory: axon-relay-performance-
model): identical warmup pass, never-seen inputs per timed call, forced
scalar fetch as the only sync barrier.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from pothoscomms_tpu.core.registry import BlockRegistry
import pothoscomms_tpu.blocks  # noqa: F401  (register)


def timed(fn, args_list):
    # warmup on the first args (compile), then time the rest
    out = fn(*args_list[0])
    float(jnp.sum(out[1]))
    t0 = time.perf_counter()
    for args in args_list[1:]:
        out = fn(*args)
    s = float(jnp.sum(out[1]))
    dt = time.perf_counter() - t0
    return dt / (len(args_list) - 1), s


def main():
    taps = [0.0676, 0.135, 0.0676, 1, -1.142, 0.412]
    rng = np.random.default_rng(3)
    C, T = 16, 1 << 20  # 16 channels x 1Mi — 16 Mi samples per call
    reps = 4

    blk = BlockRegistry.make("/comms/iir_filter", "float32")
    blk.set_taps(taps)
    carry0, step = blk.device_core(C)

    # blocked path (t divisible by 256)
    jstep = jax.jit(step)
    xs = [(carry0, jnp.asarray(rng.normal(size=(C, T)).astype(np.float32)))
          for _ in range(reps)]
    t_blocked, _ = timed(jstep, xs)

    # sequential fallback path: same work via a T that no block divides
    # is awkward at scale; instead call the internal seq path directly
    # by monkey-patching the ladder
    blk2 = BlockRegistry.make("/comms/iir_filter", "float32")
    blk2.set_taps(taps)
    blk2._BLOCK_LS = (10**9,)  # nothing divides -> seq_step
    _, step_seq = blk2.device_core(C)
    jseq = jax.jit(step_seq)
    Tseq = 1 << 14  # per-sample scan at 1Mi would take minutes; scale
    xseq = [(carry0,
             jnp.asarray(rng.normal(size=(C, Tseq)).astype(np.float32)))
            for _ in range(reps)]
    t_seq, _ = timed(jseq, xseq)

    blocked_rate = C * T / t_blocked
    seq_rate = C * Tseq / t_seq
    print(json.dumps({
        "blocked_msamp_s": round(blocked_rate / 1e6, 1),
        "seq_msamp_s": round(seq_rate / 1e6, 1),
        "speedup": round(blocked_rate / seq_rate, 1),
        "blocked_shape": [C, T],
        "seq_shape": [C, Tseq],
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
