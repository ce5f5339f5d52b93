"""Fixed-shape framing: F0-adaptive windowed segments as batched gathers.

The reference gathers a data-dependent-length segment per frame inside Python
loops (e.g. /root/reference/world/cheaptrick.py:79-99, d4c.py:92-110).  Here
every frame gathers a static MAXLEN slab centered on its 1-based anchor index
and applies a validity mask; one vmap/batched gather replaces all loops.
"""
import jax.numpy as jnp

from .dsp.rounding import round_matlab


def gather_1based(x, index_float_1based):
    """x[min(len, max(1, round(idx))) - 1] — the reference's safe gather."""
    safe = jnp.clip(round_matlab(index_float_1based), 1, x.shape[0]).astype(jnp.int32)
    return jnp.take(x, safe - 1)


def gather_trunc_1based(x, index_float_1based):
    """x[int(min(len, max(1, idx))) - 1]: clamp then truncate (no rounding).

    Matches sites where the reference astype(int)s an already-half-offset
    float index (stonemask.py:48-50, harvest.py:189)."""
    safe = jnp.clip(index_float_1based, 1, x.shape[0]).astype(jnp.int32)
    return jnp.take(x, safe - 1)


def windowed_segment(x, fs, f0, temporal_position, half_length, max_half: int,
                     window_type: str, sub_sample_shift: bool,
                     normalize_window: bool = False):
    """Windowed waveform of length 2*half+1 (half = int(half_length*fs/f0+0.5))
    padded into a static 2*max_half+1 buffer, window applied, weighted-mean
    removed — matching d4c.get_windowed_waveform (d4c.py:92-110) when
    ``sub_sample_shift`` and cheaptrick.calculate_windowed_waveform
    (cheaptrick.py:79-99) when not (cheaptrick divides time axis by
    half_length instead of adding the fractional shift).

    Returns (waveform, mask) both of shape (2*max_half+1,); entries outside
    the true window are exactly zero.
    """
    half = jnp.floor(half_length * fs / f0 + 0.5)  # == int(.) for positive
    base_index = jnp.arange(-max_half, max_half + 1, dtype=x.dtype)
    mask = jnp.abs(base_index) <= half
    center = jnp.floor(temporal_position * fs + 0.501) + 1.0
    segment = gather_1based(x, center + base_index) * mask

    if sub_sample_shift:
        frac = (temporal_position * fs
                - jnp.floor(temporal_position * fs + 0.5)) / fs
        time_axis = base_index / fs / half_length + frac
    else:
        time_axis = base_index / fs / half_length

    if window_type == "hanning":
        window = 0.5 * jnp.cos(jnp.pi * time_axis * f0) + 0.5
    elif window_type == "blackman":
        window = (0.08 * jnp.cos(jnp.pi * time_axis * f0 * 2)
                  + 0.5 * jnp.cos(jnp.pi * time_axis * f0) + 0.42)
    else:
        raise ValueError(window_type)
    window = jnp.where(mask, window, 0.0)
    if normalize_window:
        window = window / jnp.sqrt(jnp.sum(window ** 2))

    sw = segment * window
    waveform = sw - window * (jnp.sum(sw) / jnp.sum(window))
    return jnp.where(mask, waveform, 0.0), mask, window


def windowed_segment_batch(x, fs, f0, temporal_position, half_length,
                           max_half: int, window_type: str,
                           sub_sample_shift: bool,
                           normalize_window: bool = False):
    """Batched :func:`windowed_segment`: f0/temporal_position are (F,) and
    all outputs are (F, 2*max_half+1).

    Written batched (not vmapped) so the signal gather lowers to ONE flat
    1-D-operand gather — TPU-fast — instead of vmap's batched-operand form.
    """
    f0 = f0[:, None]
    t = temporal_position[:, None]
    half = jnp.floor(half_length * fs / f0 + 0.5)
    base_index = jnp.arange(-max_half, max_half + 1, dtype=x.dtype)[None, :]
    mask = jnp.abs(base_index) <= half
    center = jnp.floor(t * fs + 0.501) + 1.0
    safe = jnp.clip(round_matlab(center + base_index), 1, x.shape[0]).astype(jnp.int32)
    segment = jnp.take(x, safe - 1) * mask

    if sub_sample_shift:
        frac = (t * fs - jnp.floor(t * fs + 0.5)) / fs
        time_axis = base_index / fs / half_length + frac
    else:
        time_axis = jnp.broadcast_to(base_index / fs / half_length,
                                     mask.shape)

    if window_type == "hanning":
        window = 0.5 * jnp.cos(jnp.pi * time_axis * f0) + 0.5
    elif window_type == "blackman":
        window = (0.08 * jnp.cos(jnp.pi * time_axis * f0 * 2)
                  + 0.5 * jnp.cos(jnp.pi * time_axis * f0) + 0.42)
    else:
        raise ValueError(window_type)
    window = jnp.where(mask, window, 0.0)
    if normalize_window:
        window = window / jnp.sqrt(jnp.sum(window ** 2, axis=1, keepdims=True))

    sw = segment * window
    waveform = sw - window * (jnp.sum(sw, axis=1, keepdims=True)
                              / jnp.sum(window, axis=1, keepdims=True))
    return jnp.where(mask, waveform, 0.0), mask, window
