"""D4C aperiodicity estimator (classic) — batched over frames.

API mirrors /root/reference/world/d4c.py:10-64; returns the full-resolution
linear-amplitude aperiodicity (fft//2+1, n_frames) plus the coarse dB bands.
Does NOT mutate the source dict (the reference zeroes unvoiced f0 in place);
the effective f0 is computed functionally and returned.
"""
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..frames import uniform_frame_period_ms as _uniform_frame_period_ms
from .common import (band_window, coarse_ap_frames, d4c_fft_size,
                     love_train_fft_size, love_train_vuv)


@partial(jax.jit, static_argnames=("fs", "fft_size", "fft_size_for_spectrum",
                                   "threshold", "frequency_interval", "n_ap",
                                   "frame_period_ms"))
def _d4c_core(x, fs, f0_seq, temporal_positions, fft_size, fft_size_for_spectrum,
              threshold, frequency_interval, n_ap, frame_period_ms=None):
    dtype = x.dtype
    f0_low_limit = 47.0
    window = band_window(fs, fft_size, frequency_interval)
    max_half_lt = int(1.5 * fs / 40.0 + 0.5)
    max_half = int(2.0 * fs / f0_low_limit + 0.5)
    fft_lt = love_train_fft_size(fs)

    vuv_lt = love_train_vuv(x, fs, f0_seq, temporal_positions, threshold,
                            max_half_lt, fft_lt, frame_period_ms)

    current_f0 = jnp.maximum(f0_low_limit, f0_seq)
    coarse_all = coarse_ap_frames(x, fs, current_f0,
                                  temporal_positions.astype(dtype),
                                  frequency_interval, fft_size, n_ap, window,
                                  max_half, dtype, frame_period_ms)
    coarse_all = jnp.maximum(0.0, coarse_all
                             - (current_f0[:, None] - 100.0) * 2.0 / 100.0)
    coarse_all = jnp.where(vuv_lt[:, None], coarse_all, 0.0)

    # interp coarse bands (with -60 dB anchor at 0 Hz and ~0 dB at fs/2) to
    # the spectrum's bin axis, then to linear amplitude (d4c.py:58-59)
    kmax = fft_size_for_spectrum // 2 + 1
    freq_axis = jnp.arange(kmax, dtype=dtype) * fs / fft_size_for_spectrum
    coarse_axis = np.r_[np.arange(n_ap + 1) * frequency_interval, fs / 2.0]
    vals = jnp.concatenate(
        [jnp.full((coarse_all.shape[0], 1), -60.0, dtype),
         -coarse_all,
         jnp.full((coarse_all.shape[0], 1), -0.000000000001, dtype)], axis=1)
    ca = jnp.asarray(coarse_axis, dtype=dtype)
    j = jnp.clip(jnp.searchsorted(ca, freq_axis, side="right") - 1, 0, n_ap)
    x0 = ca[j]
    x1 = ca[j + 1]
    y0 = vals[:, j]
    y1 = vals[:, j + 1]
    ap_db = y0 + (y1 - y0) * ((freq_axis - x0) / (x1 - x0))
    aperiodicity = 10.0 ** (ap_db / 20.0)
    aperiodicity = jnp.where(vuv_lt[:, None], aperiodicity, 1.0 - 0.000000000001)

    f0_eff = jnp.where(f0_seq == 0, 0.0, f0_seq)
    return aperiodicity, -coarse_all * jnp.where(vuv_lt[:, None], 1.0, 0.0), f0_eff


def d4c(x, fs, f0_object, threshold=0.85, fft_size_for_spectrum=None):
    """Band aperiodicity estimation (API mirrors d4c.py:10-64)."""
    x = jnp.asarray(x)
    if fft_size_for_spectrum is None:
        fft_size_for_spectrum = int(2 ** np.ceil(np.log2(3 * fs / 71 + 1)))
    fft_size = d4c_fft_size(fs)
    upper_limit = 15000
    frequency_interval = 2000 if fs < 16000 else 3000
    n_ap = int(np.floor(min(upper_limit, fs / 2 - frequency_interval)
                        / frequency_interval))
    assert n_ap > 0

    f0 = jnp.asarray(f0_object["f0"])
    vuv = jnp.asarray(f0_object["vuv"])
    f0 = jnp.where(vuv == 0, 0.0, f0)
    tp = jnp.asarray(f0_object["temporal_positions"])
    fp_ms = _uniform_frame_period_ms(f0_object["temporal_positions"])
    ap, coarse, f0_eff = _d4c_core(
        x, int(fs), f0, tp, int(fft_size), int(fft_size_for_spectrum),
        float(threshold), float(frequency_interval), int(n_ap), fp_ms)
    out = dict(f0_object)
    out["f0"] = f0_eff
    out["aperiodicity"] = ap.T
    out["coarse_ap"] = coarse.T
    return out
