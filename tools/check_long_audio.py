"""Long-audio probe: encode+decode a 60 s signal on the real TPU.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/check_long_audio.py [seconds]

The reference handles arbitrary lengths at O(n log n) on CPU
(/root/reference/world/harvest.py:33-34 builds one full-signal spectrum);
our static-shape design must stay on-chip at minutes of audio.  Two pieces
make that feasible (see world_tpu/dsp/fir.py):

  * the band filterbank runs as blocked overlap-add (lax.scan over 16384-
    sample chunks carrying the L-1 tail) past 65536 samples, so the im2col
    column matrix is O(block*L) instead of O(n*L) — at 60 s / 22.05 kHz the
    one-shot path would materialize ~1.3M x ~1.5k doubles per band batch
    (~500 GB equivalent pressure across 140 bands before fusion; the
    blocked path holds ~16k x 1.5k);
  * harvest refinement is already frame-chunked (f0/harvest.py
    frame_chunk), bounding the refinement working set.

This probe checks the whole pipeline end-to-end: finite outputs, sane
voicing on a synthetic vowel-like signal, and waveform round-trip energy.
"""
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def synth_signal(fs: int, seconds: float) -> np.ndarray:
    """Vowel-like test signal: f0 glide 110->220 Hz with harmonics, plus
    silence gaps so voiced-section logic is exercised."""
    n = int(fs * seconds)
    t = np.arange(n) / fs
    f0 = 110.0 * 2 ** (t / max(t[-1], 1e-9))          # one octave glide
    phase = 2 * np.pi * np.cumsum(f0) / fs
    x = np.zeros(n)
    for h, a in [(1, 1.0), (2, 0.5), (3, 0.3), (4, 0.2)]:
        x += a * np.sin(h * phase)
    # 200 ms silence every 2 s
    gate = (np.floor(t / 2.0) != np.floor((t + 0.2) / 2.0))
    x *= np.where(gate, 0.0, 1.0)
    x += 1e-4 * np.random.RandomState(0).randn(n)
    return (0.5 * x / np.abs(x).max()).astype(np.float32)


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    fs = 22050
    x = synth_signal(fs, seconds)
    print(f"signal: {seconds:.0f} s @ {fs} Hz = {len(x)} samples", flush=True)

    from world_tpu import World

    w = World()
    t0 = time.perf_counter()
    dat = w.encode(fs, x, f0_method="harvest", is_requiem=True)
    t_enc = time.perf_counter() - t0
    f0 = np.asarray(dat["f0"])
    vuv = np.asarray(dat["vuv"])
    print(f"encode {t_enc:.1f}s (incl compile): {f0.shape[0]} frames, "
          f"{int(vuv.sum())} voiced", flush=True)
    assert np.all(np.isfinite(f0))
    voiced = f0[f0 > 0]
    assert voiced.size > 0.5 * f0.size, "glide should be mostly voiced"
    assert 100.0 < np.median(voiced) < 240.0, np.median(voiced)

    t0 = time.perf_counter()
    out = w.decode(dat)
    t_dec = time.perf_counter() - t0
    y = np.asarray(out["out"])
    rms = float(np.sqrt(np.mean(y ** 2)))
    print(f"decode {t_dec:.1f}s: y {y.shape}, max|y| {np.abs(y).max():.3f}, "
          f"rms {rms:.4f}", flush=True)
    assert np.all(np.isfinite(y)) and np.abs(y).max() <= 1.0
    assert rms > 0.01

    # steady-state (warm) timings: second runs hit the jit cache, so these
    # measure the on-chip pipeline, not compilation
    t0 = time.perf_counter()
    dat2 = w.encode(fs, x, f0_method="harvest", is_requiem=True)
    float(np.asarray(dat2["f0"]).sum())
    t_enc_warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    out2 = w.decode(dat2)
    float(np.asarray(out2["out"]).sum())
    t_dec_warm = time.perf_counter() - t0
    xrt = seconds / (t_enc_warm + t_dec_warm)
    print(f"warm encode {t_enc_warm:.2f}s + decode {t_dec_warm:.2f}s "
          f"=> {xrt:.1f}x realtime", flush=True)
    print("LONG AUDIO OK")
    if len(sys.argv) > 2:
        import json

        with open(sys.argv[2], "w") as f:
            json.dump({
                "hardware": f"1x {jax.devices()[0].device_kind}",
                "fixture": f"synthetic vowel glide, {seconds:.0f} s @ {fs} Hz"
                           f" ({len(x)} samples)",
                "frames": int(f0.shape[0]), "voiced_frames": int(vuv.sum()),
                "median_voiced_f0_hz": float(np.median(voiced)),
                "encode_s_warm": round(t_enc_warm, 2),
                "decode_s_warm": round(t_dec_warm, 2),
                "xrt_warm": round(xrt, 1),
                "resynth_rms": round(rms, 4),
                "notes": "single chip; band filterbank runs blocked "
                         "overlap-add (dsp/fir.py), refinement frame-chunked"
                         " (f0/harvest.py), 32-band chunking past ~27 s "
                         "(f0/harvest.py band_chunk)",
            }, f, indent=2)
            f.write("\n")


if __name__ == "__main__":
    main()
