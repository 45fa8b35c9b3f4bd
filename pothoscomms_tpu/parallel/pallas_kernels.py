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


# --------------------------------------------------------------------- #
# Round-4 fused FIR+FFT kernel (one HBM pass)
# --------------------------------------------------------------------- #
# The whole circular-correction chain — two-stage CT FFT, spectrum
# multiply by H = FFT(h), and the circular->linear correction u @ Gc —
# in ONE kernel: each [tb, N] window tile is read once, everything runs
# in VMEM, the spectrum is written once. Why this beats round 1's
# fused-FFT kernel (2.5x slower than XLA):
#
#   * no 16x twiddle tile expansion: the DIF stage-2 contraction is
#     restructured as X2[t, ps, m] = sum_b V[b, ps] * (W_N^{mb} S[t,b,m])
#     with ps = p*16+s — U stays [t, 128, 8];
#   * the output interleave n = p*128 + 8s + m is FREE: [t, ps, m]
#     row-major IS natural order, so the out ref is declared
#     [B, 128, 8] and the caller's reshape to [B, N] is an XLA bitcast
#     (Mosaic rejects minor-8 vector reshapes INSIDE kernels —
#     benches/probe_mosaic.py — but the ref layout trick needs none);
#   * row tiles big enough (>=128) that the ~35 us/grid-step relay
#     overhead amortizes (benches/probe_pallas_ceiling.py: a trivial
#     kernel streams 57.8 GB/s at tb=256, matching the XLA roof).
#
# Math (N = 1024 = u(8) x v(128), DIF, window row x[n], n = a*128 + b):
#   S[b, m]   = sum_a x[a*128+b] W8^{am}           (stage 1, m = q mod 8)
#   U[b, m]   = W_N^{mb} S[b, m]                   (twiddle, no expansion)
#   X[p*128 + 8s + m] = sum_b U[b, m] W8^{pb} W128^{sb}
#                     = sum_b U[b, m] V[b, p*16+s] (stage 2)
# then spec = X . H + u_w @ Gc (correction rows live per m: Gc[m]).
def _fir_fft_fused_kernel(u: int, v: int, with_corr: bool, chunk: int):
    """Rows are processed in ``chunk``-sized sub-tiles (static python
    loop) so intermediate lifetimes stay bounded — Mosaic stack-
    allocates live temporaries against the 16 MB scoped-VMEM cap (a
    straight-line tb=128 body needed 34 MB)."""

    def kernel(xr_ref, xi_ref, ur_ref, ui_ref, f8r_ref, f8i_ref,
               twr_ref, twi_ref, vr_ref, vi_ref, hr_ref, hi_ref,
               gcr_ref, gci_ref, yr_ref, yi_ref):
        # Mosaic supports only DEFAULT and HIGHEST dot precisions
        # in-kernel; HIGHEST keeps the FFT inside the reference 0.01-abs
        # contract with wide margin
        dot1 = partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        f8r, f8i = f8r_ref[:], f8i_ref[:]
        twr, twi = twr_ref[:], twi_ref[:]
        vr, vi = vr_ref[:], vi_ref[:]
        hr, hi = hr_ref[:], hi_ref[:]  # H in [m(8), ps(128)] layout

        # STATIC python loop with static slices: lax.fori_loop around
        # ref stores hits an infinite recursion in Mosaic's
        # convert-element-type lowering on this backend (bisected,
        # round 4); statically-unrolled chunks compile fine. NOTE
        # Mosaic does NOT reuse buffers across unrolled chunks — VMEM
        # grows with tile_b/chunk count, so callers keep tile_b modest.
        for cidx in range(xr_ref.shape[0] // chunk):
            sl = slice(cidx * chunk, (cidx + 1) * chunk)
            xr = xr_ref[sl, :].reshape(chunk, u, v)
            xi = xi_ref[sl, :].reshape(chunk, u, v)
            # stage 1: contract a(8) -> S[t, b(128), m(8)]
            sr = dot1(xr, f8r) - dot1(xi, f8i)
            si = dot1(xr, f8i) + dot1(xi, f8r)
            # twiddle W_N^{mb} as [b(128), m(8)] — no tile expansion
            ur_ = sr * twr - si * twi
            ui_ = sr * twi + si * twr
            # stage 2: contract b(128) -> [t, m(8), ps(128)]
            cr = dot1(ur_, vr) - dot1(ui_, vi)
            ci = dot1(ur_, vi) + dot1(ui_, vr)
            # H multiply in the pre-swap [m, ps] layout
            yr = cr * hr - ci * hi
            yi = cr * hi + ci * hr
            if with_corr:
                # circular->linear correction as ONE flat matmul
                # [chunk, pp] @ [pp, 1024], columns ordered m-major so
                # the (allowed) (1024)->(8,128) reshape lands in the
                # same [m, ps] layout
                uwr = ur_ref[sl, :]
                uwi = ui_ref[sl, :]
                gfr, gfi = gcr_ref[:], gci_ref[:]
                dr = (dot1(uwr, gfr) - dot1(uwi, gfi)).reshape(
                    chunk, u, v)
                di = (dot1(uwr, gfi) + dot1(uwi, gfr)).reshape(
                    chunk, u, v)
                yr = yr + dr
                yi = yi + di
            # [t, m, ps] -> [t, ps, m]: row-major (ps, m) IS bin order
            yr_ref[sl, :, :] = jnp.swapaxes(yr, 1, 2)
            yi_ref[sl, :, :] = jnp.swapaxes(yi, 1, 2)

    return kernel


@partial(jax.jit, static_argnames=("u", "v", "pp", "tile_b", "chunk",
                                   "with_corr", "interpret"))
def fir_fft_fused_pallas(xr, xi, uwr, uwi, f8r, f8i, twr, twi, vr, vi,
                         hr, hi, gcr, gci, u: int, v: int, pp: int,
                         tile_b: int = 256, chunk: int = 64,
                         with_corr: bool = True,
                         interpret: bool = False):
    """One-pass fused FIR+FFT: [B, N] planes (+ per-window correction
    operands [B, pp]) -> [B, v, u] planes whose row-major order is the
    natural spectrum (caller reshapes to [B, N] — an XLA bitcast)."""
    B, N = xr.shape
    tb = min(tile_b, B)
    grid = (B // tb,)
    z = lambda i: (i * 0, i * 0)
    z3 = lambda i: (i * 0, i * 0, i * 0)
    yr, yi = pl.pallas_call(
        _fir_fft_fused_kernel(u, v, with_corr, min(chunk, tb)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, N), lambda i: (i, i * 0)),
            pl.BlockSpec((tb, N), lambda i: (i, i * 0)),
            pl.BlockSpec((tb, pp), lambda i: (i, i * 0)),
            pl.BlockSpec((tb, pp), lambda i: (i, i * 0)),
            pl.BlockSpec((u, u), z),
            pl.BlockSpec((u, u), z),
            pl.BlockSpec((v, u), z),
            pl.BlockSpec((v, u), z),
            pl.BlockSpec((v, v), z),
            pl.BlockSpec((v, v), z),
            pl.BlockSpec((u, v), z),
            pl.BlockSpec((u, v), z),
            pl.BlockSpec((pp, N), z),
            pl.BlockSpec((pp, N), z),
        ],
        out_specs=(
            pl.BlockSpec((tb, v, u), lambda i: (i, i * 0, i * 0)),
            pl.BlockSpec((tb, v, u), lambda i: (i, i * 0, i * 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, v, u), jnp.float32),
            jax.ShapeDtypeStruct((B, v, u), jnp.float32),
        ),
        interpret=interpret,
    )(xr, xi, uwr, uwi, f8r, f8i, twr, twi, vr, vi, hr, hi, gcr, gci)
    return yr, yi


@lru_cache(maxsize=8)
def _fused_chain_consts(taps_key, nbins: int, pp: int):
    """Numpy constants for the fused kernel at N = nbins = 8*128:
    F8, TW [b, m], V [b, ps], H in [ps, m] layout, Gc per m."""
    taps = np.asarray(taps_key, np.complex128)
    u, v = 8, nbins // 8
    W = lambda mod, e: np.exp(-2j * np.pi * e / mod)
    f8 = W(u, np.outer(np.arange(u), np.arange(u)))
    tw = W(nbins, np.outer(np.arange(v), np.arange(u)))      # [b, m]
    p_, s_ = np.divmod(np.arange(v), v // u)                 # ps = p*16+s
    vmat = (W(u, np.outer(np.arange(v), p_))
            * W(v, np.outer(np.arange(v), s_)))              # [b, ps]
    H = np.fft.fft(taps, nbins)
    # bin n = ps*8 + m; H and Gc live in the kernel's pre-swap [m, ps]
    # layout (H as [m, ps]; Gc flat with m-major columns so the allowed
    # (1024)->(8,128) reshape lands in [m, ps])
    Hl = H.reshape(v, u).T                                   # [m, ps]
    k = len(taps)
    f = np.exp(-2j * np.pi * np.outer(np.arange(nbins),
                                      np.arange(nbins)) / nbins)
    gc = np.zeros((pp, nbins), np.complex128)
    for mm in range(1, k):
        for j in range(0, k - mm):
            # u_w rows are ordered oldest-first with leading zero pad:
            # row pp - mm corresponds to offset -mm
            gc[pp - mm] += taps[j + mm] * f[j]
    gcf = gc.reshape(pp, v, u).transpose(0, 2, 1).reshape(pp, nbins)
    to32 = lambda z: (z.real.astype(np.float32), z.imag.astype(np.float32))
    return (to32(f8), to32(tw), to32(vmat), to32(Hl), to32(gcf))


def make_fused_pallas_chain(taps, nbins: int, pp: int = 64,
                            tile_b: int = 256, chunk: int = 64,
                            interpret: bool | None = None):
    """Build run(x [C, T, 2], hist [C, K-1, 2]) -> (spec frames
    [C, T//nbins, nbins, 2], new_hist) on the fused one-pass kernel.
    Requires nbins % 128 == 0 and nbins // 128 == 8 (N = 1024)."""
    import numpy as _np

    taps = _np.asarray(taps)
    k = len(taps)
    assert k - 1 <= pp
    u, v = 8, nbins // 8
    assert v == 128, "fused kernel is specialized to N = 1024"
    (f8r, f8i), (twr, twi), (vr, vi), (hr, hi), (gcr, gci) = \
        _fused_chain_consts(tuple(taps.tolist()), nbins, pp)
    consts = tuple(jnp.asarray(a) for a in
                   (f8r, f8i, twr, twi, vr, vi, hr, hi, gcr, gci))

    @partial(jax.jit, static_argnames=("interp",))
    def run_(x, hist, interp):
        c, t, _ = x.shape
        nw = t // nbins
        B = c * nw
        xw = x.reshape(c, nw, nbins, 2)
        # u_w[i] (i < pp): prev_tail - own_tail, zero-padded at front
        tails = xw[:, :, nbins - (k - 1):, :]
        prev = jnp.concatenate([hist[:, None], tails[:, :-1]], axis=1)
        uw = prev - tails
        uw = jnp.concatenate(
            [jnp.zeros((c, nw, pp - (k - 1), 2), x.dtype), uw], axis=2)
        xr = xw[..., 0].reshape(B, nbins)
        xi = xw[..., 1].reshape(B, nbins)
        uwr = uw[..., 0].reshape(B, pp)
        uwi = uw[..., 1].reshape(B, pp)
        yr, yi = fir_fft_fused_pallas(
            xr, xi, uwr, uwi, *consts, u=u, v=v, pp=pp,
            tile_b=tile_b, chunk=chunk, with_corr=True, interpret=interp)
        spec = jnp.stack([yr.reshape(B, nbins), yi.reshape(B, nbins)],
                         axis=-1)
        new_hist = x[:, t - (k - 1):, :] if k > 1 else x[:, :0, :]
        return spec.reshape(c, nw, nbins, 2), new_hist

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    def run(x, hist):
        return run_(x, hist, interp=interpret)

    return run


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
