"""Localize batched-vs-single-stream bitwise drift per pipeline stage.

Runs each stage core single-stream and vmapped(B rows of the same input) on
the current backend and reports, per output, how many elements differ.
Stages share inputs (the single-stream upstream outputs) so a divergence is
attributed to the stage that first produces it, not inherited.

Usage:
    python tools/diag_batched_bitwise.py            # CPU f32
    PYTHONPATH=/root/repo:/root/.axon_site python tools/diag_batched_bitwise.py  # TPU
"""
import sys
import time

import numpy as np


def cmp(tag, s, b, B):
    s = np.asarray(s)
    rep = []
    for i in range(B):
        bi = np.asarray(b[i])
        n = int(np.sum(s != bi))
        rep.append(n)
    status = "ok " if not any(rep) else "DIFF"
    extra = ""
    if any(rep):
        bi = np.asarray(b[0])
        d = np.abs(s.astype(np.float64) - bi.astype(np.float64))
        extra = f" max|d|={d.max():.3e}"
    print(f"[{status}] {tag}: per-row mismatches {rep} / {s.size}{extra}",
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from scipy.io import wavfile

    from world_tpu.dsp.iir import decimate_matlab
    from world_tpu.f0.harvest import _harvest_core
    from world_tpu.spectral.cheaptrick import _cheaptrick_core, default_fft_size
    from world_tpu.aperiodicity.d4c_requiem import _d4c_requiem_core
    from world_tpu.synth.requiem import _excitation_core, _waveform_core
    from world_tpu.synth.seeds import get_seeds_signals

    fs, x_int16 = wavfile.read("/root/reference/test/test-mwm.wav")
    fs = int(fs)
    dur = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    x = (x_int16 / (2 ** 15 - 1)).astype(np.float32)[: int(dur * fs)]
    B = 3
    xj = jnp.asarray(x)
    xb = jnp.asarray(np.stack([x] * B))
    n_bands = int(np.ceil(np.log2((800 * 1.1) / (71 * 0.9)) * 40))
    mc = int(n_bands / 10 + 0.5)
    t0 = time.time()

    def stage(tag, fn, *args):
        s = jax.jit(fn)(*args)
        bat = jax.jit(jax.vmap(fn))(*[jnp.asarray(np.stack([np.asarray(a)] * B))
                                      for a in args])
        if isinstance(s, dict):
            for k in s:
                cmp(f"{tag}.{k}", s[k], bat[k], B)
        elif isinstance(s, (tuple, list)):
            for j, sj in enumerate(s):
                cmp(f"{tag}[{j}]", sj, bat[j], B)
        else:
            cmp(tag, s, bat, B)
        print(f"  (+{time.time()-t0:.0f}s)", flush=True)
        return s

    r = int(fs / 8000.0)
    stage("decimate_matlab", lambda a: decimate_matlab(a, r), xj)

    hv = stage("harvest_core",
               lambda a: _harvest_core(a, fs, 71.0, 800.0, 5.0, mc, 256,
                                       x.shape[0]), xj)
    f0, vuv, tp = hv["f0"], hv["vuv"], hv["temporal_positions"]
    fft_size = default_fft_size(fs)
    f0_ct = jnp.where(vuv == 0, 500.0, f0)
    ct = stage("cheaptrick_core",
               lambda a, b: _cheaptrick_core(a, fs, b, tp, fft_size, -0.15,
                                             5.0), xj, f0_ct)
    env, f0_eff = ct[0], ct[2]
    f0_d4c = jnp.where(vuv == 0, 0.0, f0_eff)
    fft_req = int(2 ** np.ceil(np.log2(3 * fs / 47 + 1)))
    n_ap = int(np.floor(min(15000, fs / 2 - 3000) / 3000))
    band_ap = stage("d4c_requiem_core",
                    lambda a, b: _d4c_requiem_core(a, fs, b, tp, fft_req,
                                                   0.85, 3000.0, n_ap, 5.0),
                    xj, f0_d4c)

    seeds = get_seeds_signals(fs)
    pulse = jnp.asarray(np.asarray(seeds["pulse"], np.float32))
    noise = jnp.asarray(np.asarray(seeds["noise"], np.float32))
    y_length = int(np.floor((int(1000 * x.shape[0] / fs / 5 + 1) - 1)
                            * 5 / 1000 * fs)) + 1
    noise_offsets = jnp.zeros(pulse.shape[1], jnp.int32)
    exc = stage("excitation_core",
                lambda t, f, v, ap: _excitation_core(
                    t, f, v, ap, pulse, noise, noise_offsets, fs, y_length,
                    2048, 40, 0.005),
                tp, f0_d4c, vuv, band_ap.T)
    fps = int(5 / 1000 * fs)
    stage("waveform_core",
          lambda e, en, t: _waveform_core(e, en, t, fs, fft_size, fps),
          exc[0], env.T, tp)


if __name__ == "__main__":
    main()
