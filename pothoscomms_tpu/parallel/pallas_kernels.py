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

Measured outcome on this chip (benches/probe_tpu.py round 1, compiled
mode, chained inputs): the fused Pallas FFT runs correct (3.7e-9 vs the
XLA factorization) but ~2.5x SLOWER than the XLA matmul FFT — per-grid
-step overhead through this backend dominates the saved HBM traffic.
The production chain therefore uses the combined FIR*DFT matmul
operator (parallel/chain.py) instead; these kernels stay as the Pallas
reference implementation, exercised in compiled mode by the TPU test
lane (tests/test_tpu_lane.py).
"""

from __future__ import annotations

from functools import lru_cache, partial

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


# --------------------------------------------------------------------- #
# Fused two-stage FFT kernel
# --------------------------------------------------------------------- #
def _fft_fused_kernel(u: int, v: int):
    """Kernel factory: both Cooley-Tukey stages on a VMEM-resident tile.

    The XLA version round-trips [B, N] intermediates through HBM between
    the two DFT matmuls and the twiddle — dominant on this
    bandwidth-starved part. Here a [tb, N] tile is read once, both
    stages run in VMEM, and the result is written once.

    Decomposition chosen so every reshape keeps a 128-wide minor dim
    (Mosaic rejects (.., 128, 8) -> (.., 1024) collapses): sample index
    n = a*128 + b, output index k = p*128 + q, with

        X[p*128+q] = sum_b W8^{bp} W_N^{bq} * (sum_a x[a*128+b] W8^{a(q%8)})

    Stage 1 contracts the 8-wide major axis; the tiled twiddle expands
    q%8 -> q; stage 2 contracts the 128-wide axis. Validated exact vs
    numpy FFT.
    """

    def kernel(xr_ref, xi_ref, f8r_ref, f8i_ref, twr_ref, twi_ref,
               gr_ref, gi_ref, yr_ref, yi_ref):
        tb = xr_ref.shape[0]
        mk = lambda axis: partial(
            jax.lax.dot_general,
            dimension_numbers=(((axis,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        dot1, dot2 = mk(1), mk(2)
        # [tb, N] -> [tb, u(8), v(128)] (minor stays 128)
        xr = xr_ref[:].reshape(tb, u, v)
        xi = xi_ref[:].reshape(tb, u, v)
        f8r, f8i = f8r_ref[:], f8i_ref[:]
        # stage 1: contract a(8) -> A[t, v(128), qt(8)]
        ar = dot1(xr, f8r) - dot1(xi, f8i)
        ai = dot1(xr, f8i) + dot1(xi, f8r)
        # A[t, v, qt] -> [t, qt, v] then tile 16x: A_exp[t, q(128), v]
        ar = jnp.swapaxes(ar, 1, 2)
        ai = jnp.swapaxes(ai, 1, 2)
        ar = jnp.concatenate([ar] * (v // u), axis=1)
        ai = jnp.concatenate([ai] * (v // u), axis=1)
        # twiddle W_N^{bq} as [q, v]
        twr, twi = twr_ref[:], twi_ref[:]
        br = ar * twr - ai * twi
        bi = ar * twi + ai * twr
        # stage 2: contract v(128) with G[v, p(8)] -> [t, q(128), p(8)]
        gr, gi = gr_ref[:], gi_ref[:]
        cr = dot2(br, gr) - dot2(bi, gi)
        ci = dot2(br, gi) + dot2(bi, gr)
        # [t, q, p] -> [t, p, q] -> [t, N] (collapse with 128 minor)
        cr = jnp.swapaxes(cr, 1, 2)
        ci = jnp.swapaxes(ci, 1, 2)
        yr_ref[:] = cr.reshape(tb, u * v)
        yi_ref[:] = ci.reshape(tb, u * v)

    return kernel


@partial(jax.jit, static_argnames=("u", "v", "tile_b", "interpret"))
def fft_fused_pallas(xr, xi, f8r, f8i, twr, twi, gr, gi,
                     u: int, v: int, tile_b: int = 16,
                     interpret: bool = False):
    """Fused two-stage FFT: [B, N] planes -> [B, N] planes, N = u*v."""
    B, N = xr.shape
    tb = min(tile_b, B)
    grid = (B // tb,)
    return pl.pallas_call(
        _fft_fused_kernel(u, v),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, N), lambda i: (i, i * 0)),
            pl.BlockSpec((tb, N), lambda i: (i, i * 0)),
            pl.BlockSpec((u, u), lambda i: (i * 0, i * 0)),
            pl.BlockSpec((u, u), lambda i: (i * 0, i * 0)),
            pl.BlockSpec((v, v), lambda i: (i * 0, i * 0)),
            pl.BlockSpec((v, v), lambda i: (i * 0, i * 0)),
            pl.BlockSpec((v, u), lambda i: (i * 0, i * 0)),
            pl.BlockSpec((v, u), lambda i: (i * 0, i * 0)),
        ],
        out_specs=(
            pl.BlockSpec((tb, N), lambda i: (i, i * 0)),
            pl.BlockSpec((tb, N), lambda i: (i, i * 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N), jnp.float32),
            jax.ShapeDtypeStruct((B, N), jnp.float32),
        ),
        interpret=interpret,
    )(xr, xi, f8r, f8i, twr, twi, gr, gi)


@lru_cache(maxsize=16)
def _fused_fft_consts(n: int, inverse: bool):
    u, v = n // 128, 128
    sign = 2j if inverse else -2j
    W = lambda m, e: np.exp(sign * np.pi * e / m)
    f8 = W(u, np.outer(np.arange(u), np.arange(u)))
    tw = W(n, np.outer(np.arange(v), np.arange(v)))
    g = W(u, np.outer(np.arange(v) % u, np.arange(u)))
    to32 = lambda z: (z.real.astype(np.float32), z.imag.astype(np.float32))
    return to32(f8), to32(tw), to32(g)


def fft_planar_fused(x_planar, n: int, inverse: bool = False,
                     interpret: bool | None = None):
    """Pallas fused-FFT path, same contract as fft_planar (unnormalized
    inverse). Requires n = u*128 with the tile u == 8; falls back to the
    XLA factorization otherwise."""
    from pothoscomms_tpu.parallel.fft import fft_planar

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    lead = x_planar.shape[:-2]
    B = int(np.prod(lead)) if lead else 1
    u = n // 128
    ok = (HAVE_PALLAS and n % 128 == 0 and u >= 2 and 128 % u == 0
          and B % 8 == 0)
    if not ok:
        return fft_planar(x_planar, n, inverse)
    (f8r, f8i), (twr, twi), (gr, gi) = _fused_fft_consts(n, inverse)
    xr = x_planar[..., 0].reshape(B, n)
    xi = x_planar[..., 1].reshape(B, n)
    tb = 16
    while B % tb:
        tb //= 2
    yr, yi = fft_fused_pallas(
        xr, xi, jnp.asarray(f8r), jnp.asarray(f8i), jnp.asarray(twr),
        jnp.asarray(twi), jnp.asarray(gr), jnp.asarray(gi),
        u, 128, tb, interpret,
    )
    return jnp.stack([yr, yi], axis=-1).reshape(lead + (n, 2))


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
