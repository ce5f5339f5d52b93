"""Shared F0-estimation machinery: band filtering, event→candidate interp.

TPU-first reformulation of the duplicated logic in dio/harvest
(/root/reference/world/dio.py:128-185, harvest.py:252-278,499-529): the band
loop becomes a leading array axis, ragged zero-crossing lists become
fixed-capacity compacted buffers, and the 4 event-type interpolations are
masked batched lerps.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.interp import interp1_extrap
from ..dsp.zc import zero_crossing_events


def four_event_candidates(filtered, fs, temporal_positions, capacity: int):
    """neg/pos/peak/dip zero-crossing events -> per-frame f0 mean & deviation.

    filtered: (n,) band-filtered signal.  Returns (interp_f0, f0_dev) over the
    frame grid; mirrors get_f0_candidates (dio.py:156-185) /
    GetF0Candidates (harvest.py:499-529).
    """
    d = jnp.diff(filtered)
    events = [
        zero_crossing_events(filtered, fs, capacity),
        zero_crossing_events(-filtered, fs, capacity),
        zero_crossing_events(d, fs, capacity),
        zero_crossing_events(-d, fs, capacity),
    ]
    usable = jnp.all(jnp.stack([e.count for e in events]) >= 3)

    interps = jnp.stack([
        interp1_extrap(e.locations, e.f0, temporal_positions,
                       valid_count=jnp.maximum(e.count, 2))
        for e in events
    ])
    mean_f0 = jnp.mean(interps, axis=0)
    dev = jnp.std(interps, axis=0, ddof=1)
    zero = jnp.zeros_like(mean_f0)
    return (jnp.where(usable, mean_f0, zero),
            jnp.where(usable, dev, zero + 1000.0))


def band_filter_bank_spectra(windows_padded: np.ndarray, fft_size: int):
    """FFT of the per-band FIR filters (host-built, static) on device.

    windows_padded: (n_bands, max_len) numpy float array; returns the
    (n_bands, fft_size) complex spectra.  One batched FFT replaces the
    per-band np.fft.fft calls in the reference loops.
    """
    w = jnp.asarray(windows_padded)
    return jnp.fft.fft(w, n=fft_size, axis=-1)


def filter_bands(y_spectrum, band_spectra, index_bias: np.ndarray, y_length: int,
                 start_offset: int = 1):
    """Apply all band filters at once and re-align by each filter's bias.

    Returns (n_bands, y_length) real filtered signals, where band b is
    ifft(band_spectra[b] * y_spectrum)[index_bias[b] + start_offset - 1 + 1 ..].
    dio slices [bias + arange(1, y_len+1)] (dio.py:134); harvest slices
    [bias + arange(y_len)] (harvest.py:262) — controlled by start_offset
    (dio: 1, harvest: 0).
    """
    filtered_full = jnp.fft.ifft(band_spectra * y_spectrum[None, :], axis=-1).real
    rows = []
    for b in range(filtered_full.shape[0]):
        s = int(index_bias[b]) + start_offset
        rows.append(jax.lax.dynamic_slice_in_dim(filtered_full[b], s, y_length))
    return jnp.stack(rows)
