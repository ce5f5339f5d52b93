"""Batched FFTs as two-stage Cooley-Tukey matmuls (MXU path).

XLA's stock 1-D FFT on TPU runs at ~1.2-1.5 ms for a (929, 2048-4096) rfft
batch (measured, v5e) — far off the roofline.  The same transform as a
radix-sqrt(n) Cooley-Tukey decomposition is two small dense matmuls plus a
twiddle multiply: ~2*n*sqrt(n) MACs per row instead of the FFT's data
movement, which the MXU executes in tens of microseconds at these batch
sizes.

    X[n1*k2 + k1] = sum_t2 W2[t2, k2] * (T[k1, t2] * sum_t1 x[n2*t1 + t2] * W1[t1, k1])

with W1/W2 the n1-/n2-point DFT matrices and T the n-point twiddles.
Complex arithmetic is explicit re/im pairs (the MXU has no complex type);
bases are built in float64 and cast, so the f32 result matches jnp.fft to
~1e-6 relative.

``rfft``/``irfft`` dispatch to jnp.fft off-TPU (the f64 golden path is
bit-identical to the reference there) and to the matmul form on TPU.
"""
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import on_tpu

# Twiddle-matmul precision.  On TPU, DEFAULT einsums run one bf16 MXU pass
# — an fftmm rfft/irfft ROUNDTRIP measured 7.4e-3 relative error on device
# (r5), i.e. every FFT consumer (SmoothF0's contour convolution,
# CheapTrick's cepstral smoothing, the synthesis spectra/OLA) was
# quantizing its data to 8 mantissa bits; SmoothF0 alone put ~0.5 Hz of
# noise on the on-device f0 contour (most of the r4 "0.473 Hz harvest
# RMSE").  HIGH (2-term operand splits, ~2^-16 relative, half the MXU
# passes of HIGHEST) is the default: measured on device r5 it holds the
# strict golden bars at both sample rates — 0 vuv flips, voiced F0 RMSE
# 0.0013 Hz (22.05 kHz) / 0.0161 Hz (16 kHz, identical to HIGHEST's) —
# the decision-critical dots (refinement) carry their own HIGHEST pins.
# The env override exists for A/B gates (tools/probe_precision.py).
import os as _os

_PH = {"highest": jax.lax.Precision.HIGHEST,
       "high": jax.lax.Precision.HIGH,
       "default": jax.lax.Precision.DEFAULT}[
    _os.environ.get("WORLD_TPU_FFT_PRECISION", "high")]


# Below this size the DFT runs as ONE direct (n x n) basis matmul instead
# of the two-stage Cooley-Tukey split.  CT minimizes flops, but its stages
# contract over K = n1/n2 ~ sqrt(n) (32-64 lanes for the 1-8k sizes used
# here) — ~25% MXU utilization, tripled again by the HIGH-precision passes;
# the direct form contracts over K = n with MXU-perfect shapes, so despite
# ~20x the nominal flops it is several times faster on device AND one
# rounding stage more accurate.  Sizes beyond the threshold (only the
# one-off SmoothF0 contour kernel at 8-16k) keep the CT path.
_DMAX = int(_os.environ.get("WORLD_TPU_FFT_DIRECT_MAX", "4096"))


@lru_cache(maxsize=None)
def _direct_bases(n: int):
    """Host-f64 DFT bases: cos/sin of -2*pi*t*k/n, (n, n) each."""
    th = np.outer(np.arange(n, dtype=np.float64),
                  np.arange(n, dtype=np.float64)) * (-2.0 * np.pi / n)
    return np.cos(th), np.sin(th)


def _dft_core(xr, xi, n, inverse=False, ncols=None):
    """Direct one-matmul n-point DFT; same contract as _ct_core, plus
    ``ncols`` to compute only the first ncols bins (rfft)."""
    cosb, sinb = _direct_bases(n)
    if ncols is not None:
        cosb, sinb = cosb[:, :ncols], sinb[:, :ncols]
    dtype = xr.dtype
    c = jnp.asarray(cosb, dtype)
    s = jnp.asarray(-sinb if inverse else sinb, dtype)
    cr = jnp.einsum("...a,ak->...k", xr, c, precision=_PH)
    ci = jnp.einsum("...a,ak->...k", xr, s, precision=_PH)
    if xi is not None:
        cr = cr - jnp.einsum("...a,ak->...k", xi, s, precision=_PH)
        ci = ci + jnp.einsum("...a,ak->...k", xi, c, precision=_PH)
    return cr, ci


@lru_cache(maxsize=None)
def _plan(n: int):
    """(n1, n2) with n = n1*n2, both near sqrt(n) (powers of two)."""
    assert n & (n - 1) == 0 and n >= 4, n
    p = n.bit_length() - 1
    n1 = 1 << (p // 2)
    return n1, n // n1


@lru_cache(maxsize=None)
def _bases(n: int):
    n1, n2 = _plan(n)
    t1 = np.arange(n1)
    k1 = np.arange(n1)
    w1 = np.exp(-2j * np.pi * np.outer(t1, k1) / n1)
    t2 = np.arange(n2)
    k2 = np.arange(n2)
    w2 = np.exp(-2j * np.pi * np.outer(t2, k2) / n2)
    tw = np.exp(-2j * np.pi * np.outer(k1, t2) / n)      # (n1, n2)
    return w1, w2, tw


def _ct_core(xr, xi, n, inverse=False):
    """(..., n) complex (re, im; xi may be None) -> (re, im) n-point DFT."""
    n1, n2 = _plan(n)
    w1, w2, tw = _bases(n)
    if inverse:
        w1, w2, tw = np.conj(w1), np.conj(w2), np.conj(tw)
    dtype = xr.dtype
    w1r = jnp.asarray(w1.real, dtype)
    w1i = jnp.asarray(w1.imag, dtype)
    w2r = jnp.asarray(w2.real, dtype)
    w2i = jnp.asarray(w2.imag, dtype)
    twr = jnp.asarray(tw.real, dtype)
    twi = jnp.asarray(tw.imag, dtype)

    lead = xr.shape[:-1]
    xr = xr.reshape(lead + (n1, n2))
    ar = jnp.einsum("...ab,ak->...kb", xr, w1r, precision=_PH)
    ai = jnp.einsum("...ab,ak->...kb", xr, w1i, precision=_PH)
    if xi is not None:
        xi = xi.reshape(lead + (n1, n2))
        ar = ar - jnp.einsum("...ab,ak->...kb", xi, w1i, precision=_PH)
        ai = ai + jnp.einsum("...ab,ak->...kb", xi, w1r, precision=_PH)
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr
    cr = (jnp.einsum("...kb,bm->...mk", br, w2r, precision=_PH)
          - jnp.einsum("...kb,bm->...mk", bi, w2i, precision=_PH))
    ci = (jnp.einsum("...kb,bm->...mk", br, w2i, precision=_PH)
          + jnp.einsum("...kb,bm->...mk", bi, w2r, precision=_PH))
    # X[n1*k2 + k1] -> row-major (k2, k1) == the ...mk layout above
    return cr.reshape(lead + (n,)), ci.reshape(lead + (n,))


def _core(xr, xi, n, inverse=False, ncols=None):
    """Size dispatch: direct basis matmul up to _DMAX, Cooley-Tukey above."""
    if n <= _DMAX:
        return _dft_core(xr, xi, n, inverse=inverse, ncols=ncols)
    cr, ci = _ct_core(xr, xi, n, inverse=inverse)
    if ncols is not None:
        cr, ci = cr[..., :ncols], ci[..., :ncols]
    return cr, ci


def rfft(x, n: int = None, force_mm: bool = None):
    """Drop-in jnp.fft.rfft(x, n, axis=-1); matmul path on TPU."""
    if n is None:
        n = x.shape[-1]
    use_mm = on_tpu() if force_mm is None else force_mm
    if not use_mm or n & (n - 1) or n < 256:
        return jnp.fft.rfft(x, n, axis=-1)
    if x.shape[-1] < n:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])])
    re, im = _core(x[..., :n], None, n, ncols=n // 2 + 1)
    return jax.lax.complex(re, im)


def irfft(X, n: int, force_mm: bool = None):
    """Drop-in jnp.fft.irfft(X, n, axis=-1); matmul path on TPU."""
    use_mm = on_tpu() if force_mm is None else force_mm
    if not use_mm or n & (n - 1) or n < 256:
        return jnp.fft.irfft(X, n, axis=-1)
    nb = n // 2 + 1
    X = X[..., :nb]
    re, im = jnp.real(X), jnp.imag(X)
    # full Hermitian spectrum, then inverse CT; result imag ~ 0
    tail = slice(n // 2 - 1, 0, -1)
    re_f = jnp.concatenate([re, re[..., tail]], axis=-1)
    im_f = jnp.concatenate([im, -im[..., tail]], axis=-1)
    out_re, _ = _core(re_f, im_f, n, inverse=True)
    return out_re / n


def fft(x, n: int = None, force_mm: bool = None):
    """Drop-in jnp.fft.fft for real or complex x; matmul path on TPU."""
    if n is None:
        n = x.shape[-1]
    use_mm = on_tpu() if force_mm is None else force_mm
    if not use_mm or n & (n - 1) or n < 256:
        return jnp.fft.fft(x, n, axis=-1)
    if x.shape[-1] < n:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])])
    x = x[..., :n]
    if jnp.iscomplexobj(x):
        re, im = _core(jnp.real(x), jnp.imag(x), n)
    else:
        re, im = _core(x, None, n)
    return jax.lax.complex(re, im)


def ifft(X, n: int = None, force_mm: bool = None):
    """Drop-in jnp.fft.ifft (complex result); matmul path on TPU."""
    if n is None:
        n = X.shape[-1]
    use_mm = on_tpu() if force_mm is None else force_mm
    if not use_mm or n & (n - 1) or n < 256:
        return jnp.fft.ifft(X, n, axis=-1)
    if X.shape[-1] < n:
        X = jnp.pad(X, [(0, 0)] * (X.ndim - 1) + [(0, n - X.shape[-1])])
    X = X[..., :n]
    re, im = _core(jnp.real(X), jnp.imag(X), n, inverse=True)
    return jax.lax.complex(re / n, im / n)
