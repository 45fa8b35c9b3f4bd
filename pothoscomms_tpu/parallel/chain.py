"""Fused multichannel DSP chains.

A chain of blocks compiles into ONE jitted function over a
``[channels, time, 2]`` planar-complex block with explicit carry state —
the TPU replacement for the reference's per-block scheduler hops
(SURVEY.md §2.13(1)). The FIR convolution runs as a single
``lax.conv_general_dilated`` with a 2x2 feature-mixing kernel (complex
multiply expressed as real conv), which XLA maps onto the MXU; the FFT is
the matmul factorization in parallel/fft.py.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from pothoscomms_tpu.parallel import cplx
from pothoscomms_tpu.parallel.fft import fft_planar


def complex_fir_kernel(taps: np.ndarray) -> jnp.ndarray:
    """Complex FIR taps -> [out=2, in=2, K] real conv kernel.

    (yr + j yi) = sum_k h[k] * x[n-k]:
      yr = hr*xr - hi*xi ; yi = hi*xr + hr*xi
    NB: conv kernels correlate in XLA IR terms; taps are time-reversed so
    the conv computes true convolution.
    """
    h = np.asarray(taps)
    hr = h.real.astype(np.float32)[::-1].copy()
    hi = h.imag.astype(np.float32)[::-1].copy() if np.iscomplexobj(h) \
        else np.zeros_like(hr)
    w = np.zeros((2, 2, len(h)), np.float32)
    w[0, 0], w[0, 1] = hr, -hi
    w[1, 0], w[1, 1] = hi, hr
    return jnp.asarray(w)


def make_fir_kernel(taps) -> jnp.ndarray:
    return complex_fir_kernel(np.asarray(taps))


@partial(jax.jit, static_argnames=("decim",))
def fir_multichannel(x, history, kernel, decim: int = 1):
    """Multichannel complex FIR over a time block.

    x: [C, T, 2] planar; history: [C, K-1, 2] carry from the previous
    block; kernel: [2, 2, K] from complex_fir_kernel.
    Returns (y [C, T//decim, 2], new_history).
    """
    k = kernel.shape[-1]
    xin = jnp.concatenate([history, x], axis=1)      # [C, K-1+T, 2]
    # NCW conv: batch=C, feature=(re,im), width=time
    lhs = jnp.moveaxis(xin, -1, 1)                    # [C, 2, K-1+T]
    out = jax.lax.conv_general_dilated(
        lhs, kernel,
        window_strides=(decim,),
        padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"),
        preferred_element_type=jnp.float32,
    )                                                  # [C, 2, T//decim]
    y = jnp.moveaxis(out, 1, -1)
    new_hist = xin[:, xin.shape[1] - (k - 1):, :] if k > 1 else \
        xin[:, :0, :]
    return y, new_hist


@partial(jax.jit, static_argnames=("nbins", "decim"))
def fir_fft_step(x, history, kernel, nbins: int, decim: int = 1):
    """One fused step of the north-star chain: FIR -> windowed FFT.

    x: [C, T, 2]; returns (spectra [C, T//decim//nbins, nbins, 2],
    new_history). T//decim must be a multiple of nbins.
    """
    y, hist = fir_multichannel(x, history, kernel, decim)
    c, t, _ = y.shape
    frames = y.reshape(c * (t // nbins), nbins, 2)
    spec = fft_planar(frames, nbins, False)
    return spec.reshape(c, t // nbins, nbins, 2), hist


def fir_fft_chain(taps, nbins: int, channels: int, block: int,
                  decim: int = 1):
    """Build the jitted chain closure + initial carry for given shapes."""
    kernel = complex_fir_kernel(np.asarray(taps))
    k = kernel.shape[-1]
    hist0 = jnp.zeros((channels, k - 1, 2), jnp.float32)

    def run(x, carry):
        spec, hist = fir_fft_step(x, carry, kernel, nbins, decim)
        return spec, hist

    return run, hist0


# ---------------------------------------------------------------------- #
# FM receive chain (the 256-channel BASELINE.json config):
# freq_demod -> dc_removal(single stage approx per config) -> envelope
# ---------------------------------------------------------------------- #
@jax.jit
def freq_demod_planar(x, last):
    """FM discriminator on planar complex: out[i] = arg(x[i] * conj(x[i-1]))
    (reference: demod/FreqDemod.cpp:49-71). x: [C, T, 2]; last: [C, 1, 2].
    Returns (y [C, T] float32, new_last [C, 1, 2])."""
    prev = jnp.concatenate([last, x[:, :-1, :]], axis=1)
    prod = cplx.mul(x, cplx.conj(prev))
    y = jnp.arctan2(prod[..., 1], prod[..., 0])
    return y, x[:, -1:, :]
