"""Quantify float32 (TPU-precision) quality against the float64 goldens.

Runs the full pipeline in f32 on the CPU backend (no x64) and reports the
parity metrics from BASELINE.json: F0 RMSE, spectrogram log-distortion, band
aperiodicity error, resynthesis envelope correlation.

Usage: python tools/check_f32.py
"""
import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
GOLDEN = Path(__file__).resolve().parent.parent / "tests" / "golden"


def main():
    from scipy.io import wavfile

    from world_tpu import World

    fs, xi = wavfile.read("/root/reference/test/test-mwm.wav")
    x = (xi / (2 ** 15 - 1)).astype(np.float32)
    vocoder = World()

    g_h = np.load(GOLDEN / "harvest.npz")
    dat = vocoder.encode(fs, x, f0_method="harvest", is_requiem=True)

    vuv_agree = (dat["vuv"] == g_h["vuv"]).mean()
    both = (dat["vuv"] == 1) & (g_h["vuv"] == 1)
    f0_rmse = np.sqrt(np.mean((dat["f0"][both] - g_h["f0"][both]) ** 2))
    print(f"harvest f32: vuv agreement {vuv_agree:.4f}, voiced F0 RMSE {f0_rmse:.4f} Hz")

    g_ct = np.load(GOLDEN / "cheaptrick.npz")
    # golden spectrogram was computed on the dio-chain source; recompute a
    # comparable f32 envelope on the same (golden) source contour
    src = np.load(GOLDEN / "source_dio.npz")
    from world_tpu.spectral.cheaptrick import cheaptrick

    ct = cheaptrick(x, fs, {k: src[k].astype(np.float32) for k in src.files})
    spec32 = np.asarray(ct["spectrogram"], dtype=np.float64)
    ref = g_ct["spectrogram"]
    lsd = np.sqrt(np.mean((10 * np.log10(spec32) - 10 * np.log10(ref)) ** 2, axis=0))
    print(f"cheaptrick f32: median LSD {np.median(lsd):.4f} dB, p95 {np.percentile(lsd,95):.4f} dB")

    g_req = np.load(GOLDEN / "d4c_requiem.npz")
    from world_tpu.aperiodicity.d4c_requiem import d4c_requiem

    srch = np.load(GOLDEN / "source_harvest.npz")
    sh = {k: srch[k].astype(np.float32) for k in srch.files}
    ct2 = cheaptrick(x, fs, sh)
    sh["f0"] = ct2["f0_effective"]
    req = d4c_requiem(x, fs, sh)
    ap32 = np.asarray(req["aperiodicity"], dtype=np.float64)
    err = np.abs(ap32 - g_req["band_aperiodicity"])
    print(f"d4cRequiem f32: median band-dB err {np.median(err):.4f}, p95 {np.percentile(err,95):.4f}")

    dat = vocoder.decode(dat)
    y = dat["out"]
    assert np.all(np.isfinite(y))
    n = min(len(y), len(x))
    w = 512
    e_y = np.array([np.mean(y[i:i + w] ** 2) for i in range(0, n - w, w)])
    e_x = np.array([np.mean(np.asarray(x[i:i + w], np.float64) ** 2)
                    for i in range(0, n - w, w)])
    corr = np.corrcoef(np.log10(e_y + 1e-9), np.log10(e_x + 1e-9))[0, 1]
    print(f"resynthesis f32: envelope correlation {corr:.4f}, peak {np.abs(y).max():.3f}")


if __name__ == "__main__":
    main()
