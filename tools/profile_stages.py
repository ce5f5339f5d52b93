"""Per-stage TPU timing of the flagship harvest->cheaptrick->d4cRequiem->
synthesisRequiem pipeline on the BASELINE fixture. Run on the real chip."""
import time

import numpy as np
from scipy.io import wavfile

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def timed(fn, *args, repeats=5, label=""):
    from tools.axon_timing import device_time
    per_call, out = device_time(fn, *args, k=8, label=label, verbose=True)
    return out


def main():
    from world_tpu.parallel.batch import _encode_decode_one
    from world_tpu.f0.harvest import _harvest_core
    from world_tpu.spectral.cheaptrick import _cheaptrick_core, default_fft_size
    from world_tpu.aperiodicity.d4c_requiem import _d4c_requiem_core
    from world_tpu.synth.requiem import _excitation_core, _waveform_core
    from world_tpu.synth.seeds import get_seeds_signals

    fs, x_int16 = wavfile.read("/root/reference/test/test-mwm.wav")
    fs = int(fs)
    x = jnp.asarray((x_int16 / (2 ** 15 - 1)).astype(np.float32))
    sig_len = x.shape[0]
    seeds = get_seeds_signals(fs)
    pulse = jnp.asarray(np.asarray(seeds["pulse"], np.float32))
    noise = jnp.asarray(np.asarray(seeds["noise"], np.float32))

    frame_period = 5
    n_bands = int(np.ceil(np.log2((800 * 1.1) / (71 * 0.9)) * 40))
    max_candidates = int(n_bands / 10 + 0.5)
    max_sections = 256
    max_pulses = 8192

    hv_fn = jax.jit(lambda x: _harvest_core(x, fs, 71.0, 800.0,
                                            float(frame_period),
                                            max_candidates, max_sections,
                                            sig_len))
    hv = timed(hv_fn, x, label="harvest")
    f0, vuv, tp = hv["f0"], hv["vuv"], hv["temporal_positions"]

    fft_size = default_fft_size(fs)
    f0_ct = jnp.where(vuv == 0, 500.0, f0)
    ct_fn = jax.jit(lambda x, f0_ct, tp: _cheaptrick_core(
        x, fs, f0_ct, tp, fft_size, -0.15, float(frame_period)))
    env, _, f0_eff = timed(ct_fn, x, f0_ct, tp, label="cheaptrick")

    f0_d4c = jnp.where(vuv == 0, 0.0, f0_eff)
    fft_req = int(2 ** np.ceil(np.log2(3 * fs / 47 + 1)))
    n_ap = int(np.floor(min(15000, fs / 2 - 3000) / 3000))
    d4c_fn = jax.jit(lambda x, f0_d4c, tp: _d4c_requiem_core(
        x, fs, f0_d4c, tp, fft_req, 0.85, 3000.0, n_ap, float(frame_period)))
    band_ap = timed(d4c_fn, x, f0_d4c, tp, label="d4c_requiem")

    y_length = int(np.floor((int(1000 * sig_len / fs / frame_period + 1) - 1)
                            * frame_period / 1000 * fs)) + 1
    noise_offsets = jnp.zeros(pulse.shape[1], jnp.int32)
    exc_fn = jax.jit(lambda tp, f0_d4c, vuv, bap, pulse, noise: _excitation_core(
        tp, f0_d4c, vuv, bap, pulse, noise, noise_offsets, fs, y_length,
        max_pulses, 40, float(frame_period) / 1000.0)[0])
    excitation = timed(exc_fn, tp, f0_d4c, vuv, band_ap.T, pulse, noise,
                       label="excitation")

    fps = int(frame_period / 1000 * fs)
    wf_fn = jax.jit(lambda excitation, envT, tp: _waveform_core(
        excitation, envT, tp, fs, fft_size, fps))
    timed(wf_fn, excitation, env.T, tp, label="waveform")

    full = jax.jit(lambda x, p, n: _encode_decode_one(
        x, p, n, fs=fs, frame_period=frame_period, max_pulses=max_pulses,
        max_candidates=max_candidates, max_sections=max_sections))
    timed(full, x, pulse, noise, label="FULL pipeline")


if __name__ == "__main__":
    main()
