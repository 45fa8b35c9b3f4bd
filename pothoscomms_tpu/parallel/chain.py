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


def fir_toeplitz_matrices(taps, block: int = 128):
    """Complex taps -> (T0, T1) block-Toeplitz matrices, each a planar
    [B, B, 2] pair, for the matmul FIR formulation.

    With time grouped into length-B blocks, causal convolution with K<=B
    taps is y_b = x_b @ T0 + x_{b-1} @ T1 where
    T0[i, j] = h[j - i] (0 <= j-i < K) and T1[i, j] = h[j - i + B].
    On this TPU the MXU path runs ~8x faster than conv_general_dilated
    for the same FIR (the extra zero-band FLOPs are free at matmul rate).
    """
    h = np.asarray(taps, np.complex128)
    k = len(h)
    assert k <= block, "taps must fit one block"
    t0 = np.zeros((block, block), np.complex128)
    t1 = np.zeros((block, block), np.complex128)
    for d in range(k):
        t0 += np.diag(np.full(block - d, h[d]), k=d)
        if d > 0:
            t1 += np.diag(np.full(d, h[d]), k=d - block)
    t0j = np.stack([t0.real, t0.imag], -1).astype(np.float32)
    t1j = np.stack([t1.real, t1.imag], -1).astype(np.float32)
    return jnp.asarray(t0j), jnp.asarray(t1j)


@partial(jax.jit, static_argnames=("block",))
def fir_multichannel_mm(x, history, t0, t1, block: int = 128):
    """Matmul-form multichannel complex FIR (same output as
    fir_multichannel with decim=1; K-1 history carried in `history`).

    x: [C, T, 2] with T a multiple of `block`; history: [C, K-1, 2].
    """
    c, t, _ = x.shape
    k1 = history.shape[1]  # K-1
    nb = t // block
    xb = x.reshape(c, nb, block, 2)
    # previous block for each position: [hist-padded shift by one block]
    # only the last K-1 samples of the previous block matter; build the
    # "previous block" view with the stream history at block 0
    prev_tail = jnp.concatenate(
        [jnp.zeros((c, block - k1, 2), x.dtype), history], axis=1
    ) if k1 else jnp.zeros((c, block, 2), x.dtype)
    prev = jnp.concatenate([prev_tail[:, None], xb[:, :-1]], axis=1)

    def cmm(a, m):
        # HIGHEST precision: default MXU bf16 would breach the reference
        # numeric tolerances (see parallel/cplx.matmul)
        mm = lambda p, q: jnp.matmul(
            p, q, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        ar, ai = a[..., 0], a[..., 1]
        mr, mi = m[..., 0], m[..., 1]
        return jnp.stack(
            [mm(ar, mr) - mm(ai, mi), mm(ar, mi) + mm(ai, mr)], axis=-1
        )

    y = cmm(xb, t0) + cmm(prev, t1)
    y = y.reshape(c, t, 2)
    new_hist = x[:, t - k1:, :] if k1 else x[:, :0, :]
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


@partial(jax.jit, static_argnames=("nbins",))
def fir_fft_step_mm(x, history, t0, t1, nbins: int):
    """Matmul-FIR variant of fir_fft_step (decim=1, K <= 128)."""
    y, hist = fir_multichannel_mm(x, history, t0, t1)
    c, t, _ = y.shape
    frames = y.reshape(c * (t // nbins), nbins, 2)
    spec = fft_planar(frames, nbins, False)
    return spec.reshape(c, t // nbins, nbins, 2), hist


def fir_fft_chain(taps, nbins: int, channels: int, block: int,
                  decim: int = 1):
    """Build the jitted chain closure + initial carry for given shapes.

    Uses the MXU matmul-FIR path when shapes allow (decim 1, <=128 taps,
    time a multiple of 128); conv path otherwise.
    """
    taps = np.asarray(taps)
    k = len(taps)
    hist0 = jnp.zeros((channels, k - 1, 2), jnp.float32)
    if decim == 1 and k <= 128 and block % 128 == 0:
        t0, t1 = fir_toeplitz_matrices(taps)

        def run(x, carry):
            return fir_fft_step_mm(x, carry, t0, t1, nbins)

        return run, hist0
    kernel = complex_fir_kernel(taps)

    def run(x, carry):
        return fir_fft_step(x, carry, kernel, nbins, decim)

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
