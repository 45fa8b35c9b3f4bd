"""Micro-bench: frame-sync acceptance walk, event-driven vs per-offset
scalar loop (VERDICT r3 next #3 — done bar: >= 50x offsets/s).

Realistic workload: an MB-scale search buffer that is almost entirely
noise (sub-threshold correlation peaks) with a handful of frame spikes —
exactly the shape where the reference's compiled per-sample loop
(FrameSync.cpp:470-537) beat the interpreted Python walk.
"""
import json
import time

import numpy as np

from pothoscomms_tpu.blocks.framing import (
    new_sync_state,
    run_sync_automaton,
    run_sync_automaton_scalar,
)


def bench(fn, arrays, mag_thresh, dur_thresh, reps):
    n = len(arrays[3])
    t0 = time.perf_counter()
    for _ in range(reps):
        state = new_sync_state()
        i = 0
        # consume the whole buffer like FrameSync.work does: resume
        # after each accepted frame
        while True:
            sub = tuple(a[i:] for a in arrays)
            hit = fn(state, sub, mag_thresh, dur_thresh,
                     lambda fo, st: ("frame", fo))
            if hit is None:
                break
            i += hit[0] + 1
    dt = time.perf_counter() - t0
    return n * reps / dt


def main():
    rng = np.random.default_rng(7)
    n = 1 << 20  # 1 Mi offsets ~ an MB-scale work quantum
    mag_thresh, dur_thresh = 70, 50
    # float32 arrays: the dtype ops/framing.sync_search_planar actually
    # hands the automaton (corr_peak pre-floored to integer semantics)
    cp = rng.integers(0, 40, n).astype(np.float32)
    for pos in rng.integers(0, n - 200, 8):  # 8 frame-like spikes
        cp[pos] = 100.0
    arrays = (
        np.ones(n, np.float32), np.zeros(n, np.float32),
        np.zeros(n, np.float32), cp,
    )
    scalar_rate = bench(run_sync_automaton_scalar, arrays, mag_thresh,
                        dur_thresh, 1)
    event_rate = bench(run_sync_automaton, arrays, mag_thresh,
                       dur_thresh, 50)
    print(json.dumps({
        "offsets_per_s_scalar": round(scalar_rate),
        "offsets_per_s_event": round(event_rate),
        "speedup": round(event_rate / scalar_rate, 1),
        "n": n,
    }))


if __name__ == "__main__":
    main()
