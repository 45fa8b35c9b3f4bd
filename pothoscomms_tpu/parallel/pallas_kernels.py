"""Pallas TPU kernels.

First kernel: split-complex matrix multiply — the core of the MXU FFT
(parallel/fft.py). One kernel computes all four real contractions

    yr = xr @ fr - xi @ fi        yi = xr @ fi + xi @ fr

with the x-tiles loaded into VMEM once and shared by both outputs, and
the accumulation epilogue fused (XLA would otherwise schedule four
separate matmuls + adds through HBM). Layout note: planar [.., 2]
arrays put the tiny re/im axis in the lane dimension, so kernels take
separate xr/xi planes ([B, N] each) — the natural (8, 128)-tileable
shape.

On CPU (tests) the kernel runs in interpreter mode; on unsupported
setups the caller falls back to jnp matmuls (cplx.matmul).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

try:  # pallas import can fail on exotic builds; fall back gracefully
    from jax.experimental import pallas as pl

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def _cmatmul_kernel(xr_ref, xi_ref, fr_ref, fi_ref, yr_ref, yi_ref):
    xr = xr_ref[:]
    xi = xi_ref[:]
    fr = fr_ref[:]
    fi = fi_ref[:]
    # HIGHEST precision: the MXU's default single-pass bf16 costs ~1e-3
    # relative error, outside the FFT parity tolerance
    dot = partial(jnp.dot, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    yr_ref[:] = dot(xr, fr) - dot(xi, fi)
    yi_ref[:] = dot(xr, fi) + dot(xi, fr)


@partial(jax.jit, static_argnames=("tile_b", "tile_m", "interpret"))
def cmatmul_pallas(xr, xi, fr, fi, tile_b: int = 128, tile_m: int = 128,
                   interpret: bool = False):
    """Split-complex matmul: ([B,N], [B,N]) x ([N,M], [N,M]) -> 2x [B,M].

    B and M must be multiples of the tile sizes (callers pad).
    """
    B, N = xr.shape
    M = fr.shape[1]
    tb = min(tile_b, B)
    tm = min(tile_m, M)
    grid = (B // tb, M // tm)
    yr, yi = pl.pallas_call(
        _cmatmul_kernel,
        grid=grid,
        in_specs=[
            # NB: zeros derived from the index (j*0), not literal 0 — with
            # jax x64 enabled a literal traces as i64 and Mosaic rejects
            # the mixed (i32, i64) index tuple
            pl.BlockSpec((tb, N), lambda i, j: (i, j * 0)),
            pl.BlockSpec((tb, N), lambda i, j: (i, j * 0)),
            pl.BlockSpec((N, tm), lambda i, j: (i * 0, j)),
            pl.BlockSpec((N, tm), lambda i, j: (i * 0, j)),
        ],
        out_specs=(
            pl.BlockSpec((tb, tm), lambda i, j: (i, j)),
            pl.BlockSpec((tb, tm), lambda i, j: (i, j)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, M), jnp.float32),
            jax.ShapeDtypeStruct((B, M), jnp.float32),
        ),
        interpret=interpret,
    )(xr, xi, fr, fi)
    return yr, yi


def cmatmul(x_planar, fr, fi, interpret: bool | None = None):
    """Planar [.., N, 2] @ complex F (given as fr/fi) -> [.., M, 2].

    Uses the Pallas kernel when shapes tile cleanly; jnp fallback
    otherwise.
    """
    from pothoscomms_tpu.parallel import cplx

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    lead = x_planar.shape[:-2]
    N = x_planar.shape[-2]
    M = fr.shape[1]
    B = int(np.prod(lead)) if lead else 1
    ok = (
        HAVE_PALLAS
        and B % 8 == 0
        and M % 128 == 0
        and N % 128 == 0
    )
    if not ok:
        return cplx.matmul(x_planar, jnp.asarray(fr), jnp.asarray(fi))
    xr = x_planar[..., 0].reshape(B, N)
    xi = x_planar[..., 1].reshape(B, N)
    tb = 128
    while B % tb:
        tb //= 2
    tm = 128
    yr, yi = cmatmul_pallas(xr, xi, jnp.asarray(fr), jnp.asarray(fi),
                            tb, tm, interpret)
    out = jnp.stack([yr, yi], axis=-1)
    return out.reshape(lead + (M, 2))
