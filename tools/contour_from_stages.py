"""Run harvest's contour stages (SearchF0Base..SmoothF0) from dumped
candidate/score stages, on the CPU backend — the attribution half of
tools/diag_16k_flips.py: feed it one backend's refinement outputs and see
which final vuv flips they alone produce.

Usage:
  python tools/contour_from_stages.py <stages.npz> [cands_key scores_key]

stages.npz needs `_cands_clean` + `_scores_clean` (a diag_16k_flips dump) or
the keys given; flips are reported against tests/golden/harvest_16k.npz.
"""
import sys

import numpy as np


def run(cands, scores, fs, sig_len, frame_period=5.0):
    import jax
    import jax.numpy as jnp

    from world_tpu.dsp.rounding import matlab_round_half
    from world_tpu.f0.harvest import (fix_step1, fix_step2, fix_step3,
                                      fix_step4, search_f0_base, smooth_f0)

    @jax.jit
    def contour(cands, scores):
        f0_base = search_f0_base(cands, scores)
        f0_step1 = fix_step1(f0_base, 0.008)
        f0_step2 = fix_step2(f0_step1, 6)
        f0_step3 = fix_step3(f0_step2, cands, scores, 0.18, max_sections=256)
        f0_step4 = fix_step4(f0_step3, 9)
        vuv_full = jnp.where(f0_step4 != 0, 1.0, 0.0)
        smoothed = smooth_f0(f0_step4, max_sections=256)
        return f0_base, f0_step2, f0_step4, smoothed, vuv_full

    f0_base, f0_step2, f0_step4, smoothed, vuv_full = contour(
        jnp.asarray(cands), jnp.asarray(scores))
    out_samples = int(1000 * sig_len / fs / frame_period + 1)
    tp = np.arange(out_samples) * frame_period / 1000
    idx = np.minimum(np.asarray(smoothed).shape[0] - 1,
                     np.asarray(matlab_round_half(
                         jnp.asarray(tp * 1000)))).astype(np.int64)
    return {"f0": np.asarray(smoothed)[idx], "vuv": np.asarray(vuv_full)[idx],
            "f0_base": np.asarray(f0_base), "f0_step2": np.asarray(f0_step2),
            "f0_step4": np.asarray(f0_step4)}


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    path = sys.argv[1]
    ck, sk = (sys.argv[2], sys.argv[3]) if len(sys.argv) > 3 else (
        "_cands_clean", "_scores_clean")
    d = np.load(path)
    g = np.load("/root/repo/tests/golden/harvest_16k.npz")
    fs = int(g["fs"])
    sig_len = np.asarray(g["x16"]).shape[0]
    out = run(np.asarray(d[ck], np.float32), np.asarray(d[sk], np.float32),
              fs, sig_len)
    gv = np.asarray(g["vuv"]) > 0.5
    vuv = out["vuv"] > 0.5
    flips = np.where(vuv != gv)[0]
    both = vuv & gv
    rmse = float(np.sqrt(np.mean((out["f0"][both] - g["f0"][both]) ** 2)))
    print(f"{path} [{ck}]: {len(flips)} vuv flips at {flips}")
    print(f"voiced-agreeing F0 RMSE {rmse:.3f} Hz")


if __name__ == "__main__":
    main()
