"""Classic WORLD synthesis (pulse train + filtered noise overlap-add).

Semantics from /root/reference/world/synthesis.py:21-250; execution is
TPU-first:
  * pulse positions come from a phase-wrap cumsum, compacted into a
    fixed-capacity pulse table;
  * the per-pulse Python loop becomes ONE vmap: batched 2-frame spectral
    lerp, batched minimum-phase cepstrum FFTs, batched noise convolution;
  * overlap-add is a masked scatter-add (y.at[idx].add);
  * noise comes from jax.random with explicit keys (parity with the
    reference's np.random is statistical, not bitwise).
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.interp import interp1_extrap
from ..dsp.minphase import minimum_phase_spectrum, mirror_full
from ..dsp.windows import np_hanning_matlab


def _time_base(temporal_positions, f0, vuv, fs, time_axis, default_f0,
               max_pulses: int, wrap_threshold=jnp.pi):
    """Pulse locations from the wrapped phase (synthesis.py:120-140).

    ``wrap_threshold`` pi/2 reproduces the older synthesis_a variant's pulse
    detection (synthesis_a.py:113-115)."""
    f0_interp = interp1_extrap(temporal_positions, f0, time_axis)
    vuv_interp = interp1_extrap(temporal_positions, vuv, time_axis) > 0.5
    f0_interp = jnp.where(vuv_interp, f0_interp, 0.0)
    f0_interp = jnp.where(f0_interp == 0, default_f0, f0_interp)

    total_phase = jnp.cumsum(2 * jnp.pi * f0_interp / fs)
    wrap_phase = jnp.remainder(total_phase, 2 * jnp.pi)
    dwrap = jnp.abs(jnp.diff(wrap_phase))
    mask = dwrap > wrap_threshold
    n = mask.shape[0]
    slot = jnp.where(mask, jnp.cumsum(mask) - 1, max_pulses)
    count = jnp.minimum(jnp.sum(mask), max_pulses)
    pulse_locations = jnp.zeros(max_pulses, time_axis.dtype).at[slot].set(
        jnp.where(mask, time_axis[:-1], 0.0), mode="drop")
    pli = jnp.floor(pulse_locations * fs + 0.5).astype(jnp.int32) + 1
    y1 = jnp.take(wrap_phase, pli - 1) - 2.0 * jnp.pi
    y2 = jnp.take(wrap_phase, jnp.minimum(pli, n))
    shift = (-y1 / (y2 - y1)) / fs
    return pulse_locations, pli, shift, vuv_interp, count


@partial(jax.jit, static_argnames=("fs", "y_length", "fft_size", "max_pulses",
                                   "max_noise", "noise_mode", "variant"))
def _synthesis_core(f0, vuv, temporal_positions, spectrogram, aperiodicity,
                    key, fs, y_length, fft_size, max_pulses, max_noise,
                    noise_mode, variant="standard"):
    dtype = spectrogram.dtype
    default_f0 = 500.0
    time_axis = jnp.arange(y_length, dtype=dtype) / fs + temporal_positions[0]
    wrap_threshold = jnp.pi if variant == "standard" else jnp.pi / 2
    pulse_locations, pli, shifts, vuv_interp, count = _time_base(
        temporal_positions, f0, vuv, float(fs), time_axis, default_f0,
        max_pulses, wrap_threshold)
    if variant == "a":  # synthesis_a: no fractional time shift
        shifts = jnp.zeros_like(shifts)

    n_frames = temporal_positions.shape[0]
    tpi = interp1_extrap(temporal_positions,
                         jnp.arange(1, n_frames + 1, dtype=dtype), pulse_locations)
    tpi = jnp.clip(tpi, 1.0, float(n_frames))

    amp_ap = aperiodicity ** 2            # (bins, frames)
    amp_per = jnp.maximum(0.001, 1.0 - amp_ap)

    dc_base = np_hanning_matlab(fft_size)
    dc_base = jnp.asarray(dc_base / dc_base.sum(), dtype=dtype)
    coefficient = 2.0 * jnp.pi * fs / fft_size
    base_index = jnp.arange(-(fft_size // 2) + 1, fft_size // 2 + 1)
    half_k = jnp.arange(fft_size // 2 + 1, dtype=dtype)

    pulse_ids = jnp.arange(max_pulses)
    valid = pulse_ids < count
    next_pli = jnp.take(pli, jnp.minimum(jnp.minimum(pulse_ids + 1, count - 1),
                                         max_pulses - 1))
    noise_sizes = jnp.where(valid, next_pli - pli, 0)

    keys = jax.random.split(key, max_pulses)

    def per_pulse(i, key_i):
        t_idx = tpi[i]
        floor_i = jnp.floor(t_idx).astype(jnp.int32) - 1
        ceil_i = jnp.ceil(t_idx).astype(jnp.int32) - 1
        t1 = jnp.take(temporal_positions, floor_i)
        t2 = jnp.take(temporal_positions, ceil_i)
        xq = jnp.maximum(t1, jnp.minimum(t2, pulse_locations[i]))
        b = jnp.where(t1 == t2, 0.0, (xq - t1) / jnp.where(t1 == t2, 1.0, t2 - t1))
        a = 1.0 - b
        spec = a * spectrogram[:, floor_i] + b * spectrogram[:, ceil_i]
        per = a * amp_per[:, floor_i] + b * amp_per[:, ceil_i]
        aps = a * amp_ap[:, floor_i] + b * amp_ap[:, ceil_i]

        noise_size = noise_sizes[i]
        voiced = jnp.take(vuv_interp, pli[i] - 1)
        if variant == "standard":  # synthesis_a has no aperiodicity gate
            voiced = voiced & (aps[0] <= 0.999)

        # ---- periodic response (synthesis.py:100-116) ----
        tmp = spec * per
        tmp = jnp.maximum(tmp, jnp.finfo(dtype).eps)
        mp_spec = minimum_phase_spectrum(mirror_full(tmp))
        half = mp_spec[: fft_size // 2 + 1]
        ramp = jnp.exp(-1j * (coefficient * shifts[i]) * half_k)
        half = half * ramp
        full = jnp.concatenate([half, half[-2:0:-1].conj()])
        response = jnp.fft.fftshift(jnp.fft.ifft(full).real)
        dc_remover = dc_base * (-jnp.sum(response))
        periodic_response = (response + dc_remover) * jnp.sqrt(
            jnp.maximum(1.0, noise_size.astype(dtype)))
        periodic_response = jnp.where(voiced, periodic_response, 0.0)

        # ---- aperiodic response (synthesis.py:86-96) ----
        ap_spec = jnp.where(voiced, spec * aps, spec)
        ap_spec = jnp.maximum(ap_spec, jnp.finfo(dtype).eps)
        ap_response = jnp.fft.fftshift(
            jnp.fft.ifft(minimum_phase_spectrum(mirror_full(ap_spec))).real)
        n_noise = jnp.maximum(3, jnp.minimum(noise_size, max_noise))
        noise_mask = jnp.arange(max_noise) < n_noise
        if noise_mode == "constant":
            noise = jnp.where(noise_mask, 0.1, 0.0)
        else:
            noise = jnp.where(noise_mask, jax.random.normal(key_i, (max_noise,),
                                                            dtype=dtype), 0.0)
        noise = jnp.where(noise_mask, noise - jnp.sum(noise) / n_noise, 0.0)
        # conv(noise, response)[:fft_size]  (fftfilt, synthesis.py:189-250)
        conv_n = 2 * fft_size
        ap_out = jnp.fft.irfft(jnp.fft.rfft(noise, conv_n)
                               * jnp.fft.rfft(ap_response, conv_n), conv_n)[:fft_size]

        contribution = periodic_response + ap_out
        out_idx = jnp.clip(pli[i] + base_index, 1, y_length) - 1
        return jnp.where(valid[i], contribution, 0.0), out_idx

    contribs, out_idxs = jax.vmap(per_pulse)(pulse_ids, keys)
    y = jnp.zeros(y_length, dtype).at[out_idxs.reshape(-1)].add(contribs.reshape(-1))
    return y


def synthesis(source_object, filter_object, key=None, noise_mode="gaussian",
              max_pulses=None, variant="standard"):
    """Waveform synthesis (API mirrors synthesis.py:21-82).

    ``variant='a'`` reproduces the historical synthesis_a.py behavior
    (pi/2 pulse threshold, no fractional shift, no aperiodicity VUV gate;
    synthesis_a.py:59-116) — kept for completeness, not used by World.decode,
    matching the reference where it is dead code."""
    f0 = np.asarray(source_object["f0"], dtype=np.float64)
    vuv = np.asarray(source_object["vuv"], dtype=np.float64)
    tp = np.asarray(source_object["temporal_positions"], dtype=np.float64)
    spectrogram = jnp.asarray(filter_object["spectrogram"])
    aperiodicity = jnp.asarray(source_object["aperiodicity"])
    fs = int(filter_object["fs"])

    time_axis_len = len(np.arange(tp[0], tp[-1] + 1 / fs, 1.0 / fs))
    fft_size = (spectrogram.shape[0] - 1) * 2
    if max_pulses is None:
        est = int(np.ceil((tp[-1] - tp[0]) * max(500.0, float(f0.max()) * 1.2))) + 8
        max_pulses = int(2 ** np.ceil(np.log2(est)))
    max_noise = int(fs / 40) + 4
    if key is None:
        key = jax.random.PRNGKey(0)

    return _synthesis_core(
        jnp.asarray(f0, spectrogram.dtype),
        jnp.asarray(vuv, spectrogram.dtype), jnp.asarray(tp, spectrogram.dtype),
        spectrogram, aperiodicity, key, fs, time_axis_len, fft_size,
        max_pulses, max_noise, noise_mode, variant)


def synthesis_a(source_object, filter_object, key=None, noise_mode="gaussian",
                max_pulses=None):
    """The historical synthesis variant (synthesis_a.py:21-101)."""
    return synthesis(source_object, filter_object, key=key,
                     noise_mode=noise_mode, max_pulses=max_pulses, variant="a")
