"""Excitation seed signals (band-limited pulses + modified velvet noise).

Mirrors /root/reference/world/get_seeds_signals.py:8-87.  The band filters
and pulse seeds are deterministic transforms (computed with batched FFTs);
the velvet noise uses an explicit seeded RNG (the reference uses the global
`random` module — parity is statistical).  Seeds are cached per
(fs, fft_size, noise_length, seed) since the reference regenerates them on
every decode call (main.py:205) — a pure waste we do not replicate.
"""
import functools

import jax.numpy as jnp
import numpy as np

from ..dsp.windows import np_hanning_matlab


def _short_velvet_noise(n: int, rng: np.random.RandomState) -> np.ndarray:
    """generate_short_velvet_noise (get_seeds_signals.py:56-73)."""
    out = np.zeros(n)
    td = 4
    r = int(n // td + 0.5)
    safety_rand = np.ones(r)
    safety_rand[r // 2:] *= -1
    safety_rand *= 2
    # Fisher-Yates-ish swap shuffle as the reference does
    for i in range(r):
        j = rng.randint(0, r)
        safety_rand[j], safety_rand[i] = safety_rand[i], safety_rand[j]
    out[td * np.arange(r) + rng.randint(td, size=r)] = safety_rand
    return out


def _modified_velvet_noise(n: int, fs: int, rng: np.random.RandomState) -> np.ndarray:
    """generate_modified_velvet_noise (get_seeds_signals.py:40-53).

    NB the reference's round_matlab returns x+0.5 untruncated, so the chunk
    lengths are int(8*(round(base*fs/48000)+0.5)) — e.g. 33/114/224 at 22050.
    """
    base_period = np.array([8, 30, 60])
    # exact reference arithmetic: round_matlab(x) = x + 0.5 for positive x
    short_period = 8 * (base_period * fs / 48000 + 0.5)
    buf = np.zeros(n + int(np.max(short_period)) + 1)
    index = 0
    while True:
        v_len = rng.randint(0, len(short_period))
        L = int(short_period[v_len])
        buf[index:index + L] = _short_velvet_noise(L, rng)
        index += L
        if index >= n - 1:
            break
    return buf[:n]


@functools.lru_cache(maxsize=8)
def get_seeds_signals(fs: int, fft_size: int = None, noise_length: int = None,
                      seed: int = 0):
    """Band-passed pulse + velvet-noise seed banks (get_seeds_signals.py:8-38)."""
    if fft_size is None:
        fft_size = int(1024 * (2 ** np.ceil(np.log2(fs / 48000))))
    if noise_length is None:
        noise_length = int(2 ** np.ceil(np.log2(fs / 2)))
    w = np.arange(fft_size // 2 + 1) * fs / fft_size
    frequency_interval = 3000
    frequency_range = frequency_interval * 2
    upper_limit = 15000
    n_ap = int(2 + np.floor(min(upper_limit, fs / 2 - frequency_interval)
                            / frequency_interval))

    rng = np.random.RandomState(seed)
    velvet = _modified_velvet_noise(noise_length, fs, rng)
    spec_n = np.fft.fft(velvet, noise_length)

    # band spectra (n_ap, fft//2+1) — vectorized over bands
    i = np.arange(n_ap)[:, None]
    spec = 0.5 + 0.5 * np.cos(((w[None, :] - frequency_interval * i)
                               / frequency_range) * 2 * np.pi)
    spec = np.where(w[None, :] > frequency_interval * (i + 1), 0.0, spec)
    spec = np.where(w[None, :] < frequency_interval * (i - 1), 0.0, spec)
    spec[-1] = np.where(w > frequency_interval * (n_ap - 1), 1.0, spec[-1])
    full = np.concatenate([spec, spec[:, -2:0:-1]], axis=1)
    pulse = np.fft.fftshift(np.fft.ifft(full, axis=1).real, axes=1).T
    noise = np.fft.ifft(spec_n[None, :] * np.fft.fft(pulse.T, noise_length, axis=1),
                        axis=1).real.T

    h = np_hanning_matlab(fft_size)
    pulse[:, 0] = pulse[:, 0] - np.mean(pulse[:, 0]) * h / np.mean(h)
    return {"pulse": jnp.asarray(pulse), "noise": jnp.asarray(noise)}
