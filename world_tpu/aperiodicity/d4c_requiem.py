"""D4C-Requiem band aperiodicity — batched over frames.

API mirrors /root/reference/world/d4cRequiem.py:9-44: same group-delay
pipeline as classic D4C but evaluated at the spectral fft_size, returning
the COARSE (n_ap+2, n_frames) dB matrix with pinned -60 / -1e-12 rows.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..frames import uniform_frame_period_ms as _uniform_frame_period_ms
from .common import (band_window, coarse_ap_frames, love_train_fft_size,
                     love_train_vuv)


@partial(jax.jit, static_argnames=("fs", "fft_size", "threshold",
                                   "frequency_interval", "n_ap",
                                   "frame_period_ms"))
def _d4c_requiem_core(x, fs, f0_seq, temporal_positions, fft_size, threshold,
                      frequency_interval, n_ap, frame_period_ms=None):
    dtype = x.dtype
    f0_low_limit = 47.0
    window = band_window(fs, fft_size, frequency_interval)
    max_half_lt = int(1.5 * fs / 40.0 + 0.5)
    max_half = int(2.0 * fs / f0_low_limit + 0.5)
    fft_lt = love_train_fft_size(fs)

    vuv_lt = love_train_vuv(x, fs, f0_seq, temporal_positions, threshold,
                            max_half_lt, fft_lt, frame_period_ms)

    current_f0 = jnp.maximum(f0_low_limit, f0_seq)
    coarse = coarse_ap_frames(x, fs, current_f0,
                              temporal_positions.astype(dtype),
                              frequency_interval, fft_size, n_ap, window,
                              max_half, dtype, frame_period_ms)
    mid = -jnp.maximum(0.0, coarse - (current_f0[:, None] - 100.0) * 2.0 / 100.0)
    n_frames = f0_seq.shape[0]
    top = jnp.full((n_frames, 1), -60.0, dtype)
    bot = jnp.full((n_frames, 1), -0.000000000001, dtype)
    band_ap = jnp.concatenate([top, mid, bot], axis=1)
    # unvoiced frames: whole column -1e-12 (d4cRequiem.py:33-34)
    band_ap = jnp.where(vuv_lt[:, None], band_ap, -0.000000000001)
    return band_ap


def d4c_requiem(x, fs, f0_object, threshold=0.85, fft_size=None):
    """Coarse band aperiodicity (API mirrors d4cRequiem.py:9-44)."""
    x = jnp.asarray(x)
    if fft_size is None:
        fft_size = int(2 ** np.ceil(np.log2(3 * fs / 47 + 1)))
    upper_limit = 15000
    frequency_interval = 3000
    n_ap = int(np.floor(min(upper_limit, fs / 2 - frequency_interval)
                        / frequency_interval))
    assert n_ap > 0

    f0 = jnp.asarray(f0_object["f0"])
    vuv = jnp.asarray(f0_object["vuv"])
    f0 = jnp.where(vuv == 0, 0.0, f0)
    tp = jnp.asarray(f0_object["temporal_positions"])
    fp_ms = _uniform_frame_period_ms(f0_object["temporal_positions"])
    band_ap = _d4c_requiem_core(x, int(fs), f0, tp, int(fft_size),
                                float(threshold), float(frequency_interval),
                                int(n_ap), fp_ms)
    out = dict(f0_object)
    out["f0"] = f0
    out["aperiodicity"] = band_ap.T
    return out
