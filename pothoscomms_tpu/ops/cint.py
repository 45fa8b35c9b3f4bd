"""Complex-integer arithmetic.

The reference supports complex integer streams via ``std::complex<intN>``
(e.g. math/Arithmetic.cpp:272-281's complex factory entries, fft's
complex<int16>). numpy/jax have no complex-int dtype, so we represent these
streams as integer arrays with a trailing (re, im) axis of size 2 and
implement complex arithmetic explicitly, with C++-style modular wraparound
(which jnp integer arithmetic provides natively).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def re(x):
    return x[..., 0]


def im(x):
    return x[..., 1]


def make(r, i):
    return jnp.stack([r, i], axis=-1)


def add(a, b):
    return a + b


def sub(a, b):
    return a - b


def _promote(x):
    """C integer promotion: sub-int widths compute in 32-bit int; int32/
    int64/uint32/uint64 arithmetic stays in-type (wrapping per op), exactly
    as C++ evaluates std::complex<_Tp> member expressions."""
    dt = jnp.dtype(x.dtype)
    if dt.itemsize < 4:
        return x.astype(jnp.int32)
    return x


def mul(a, b):
    """std::complex<int> multiply: products evaluated in the promoted type,
    narrowed once on assignment (libstdc++ operator*= shape)."""
    out_dt = a.dtype
    ar, ai = _promote(re(a)), _promote(im(a))
    br, bi = _promote(re(b)), _promote(im(b))
    return make(
        (ar * br - ai * bi).astype(out_dt), (ar * bi + ai * br).astype(out_dt)
    )


def _idiv(a, b):
    """C-style truncation integer division (lax.div truncates toward zero),
    guarded against /0 (UB in the reference; tests avoid it)."""
    b_safe = jnp.where(b == 0, jnp.ones_like(b), b)
    return jax.lax.div(a, b_safe)


def div(a, b):
    """std::complex<int> division (libstdc++ operator/= shape): numerators
    in the promoted type; norm(z) narrowed to the element type before the
    truncating division; quotient narrowed on assignment."""
    out_dt = a.dtype
    ar, ai = _promote(re(a)), _promote(im(a))
    br, bi = _promote(re(b)), _promote(im(b))
    n = (br * br + bi * bi).astype(out_dt)  # __n = std::norm(__z) in _Tp
    n_p = _promote(n)
    return make(
        _idiv(ar * br + ai * bi, n_p).astype(out_dt),
        _idiv(ai * br - ar * bi, n_p).astype(out_dt),
    )


def conj(x):
    return make(re(x), -im(x))


def abs_int(x, out_np_dtype):
    """Fixed-point complex magnitude: sqrt(float(re^2+im^2)) cast to int
    (reference: functions/FxptHelpers.hpp:42-49 getAbs)."""
    r = re(x)
    i = im(x)
    mag2 = (r * r + i * i).astype(jnp.float32)
    return jnp.sqrt(mag2).astype(out_np_dtype)
