"""Diagnose the 16 kHz TPU-f32 vs f64-golden vuv flips, stage by stage.

Round-2 root cause: near-tied top-2 candidate scores flip the argmax under
f32 noise, and FixStep2/3 grow the flip into whole voiced sections.  The
compensated IF numerator (ops.prod_diff) and host-f64 DFT basis made the
batched and single-stream TPU programs bitwise-equal, but 29 frames still
flip vs the f64 golden while CPU-f32 matches it 100% — so some stage still
computes differently on the TPU backend than on CPU at f32.

Runs _harvest_core(debug_outputs=True) under each backend (separate
processes: ops.on_tpu() picks the Pallas vs XLA path at trace time from the
default backend) and reports, per stage, how many entries differ and where —
the first diverging stage is the one to pin.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/diag_16k_flips.py dump cpu /tmp/h16_cpu.npz
  PYTHONPATH=/root/repo:/root/.axon_site python tools/diag_16k_flips.py dump tpu /tmp/h16_tpu.npz
  python tools/diag_16k_flips.py compare /tmp/h16_cpu.npz /tmp/h16_tpu.npz
(`dump cpu` forces the host-CPU platform via jax.config — the axon plugin
ignores the JAX_PLATFORMS env var.)
"""
import sys

import numpy as np

STAGES = [
    "_raw_candidates", "_cands_detected", "_cands_overlap",
    "_cands_refined", "_scores_refined", "_cands_clean", "_scores_clean",
    "_f0_base", "_f0_step1", "_f0_step2", "_f0_step3", "_f0_step4",
    "_smoothed", "f0", "vuv",
]


def dump(path, backend=None):
    import jax

    if backend == "cpu":
        # the axon TPU plugin registers regardless of the JAX_PLATFORMS env
        # var; only jax.config reliably forces the host-CPU platform
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from world_tpu.f0.harvest import _harvest_core

    g = np.load("/root/repo/tests/golden/harvest_16k.npz")
    fs = int(g["fs"])
    x = np.asarray(g["x16"], np.float32)
    n_bands = int(np.ceil(np.log2((800 * 1.1) / (71 * 0.9)) * 40))
    mc = int(n_bands / 10 + 0.5)
    out = _harvest_core(jax.numpy.asarray(x), fs, 71.0, 800.0, 5.0, mc, 256,
                        x.shape[0], debug_outputs=True)
    np.savez(path, **{k: np.asarray(v, np.float64) for k, v in out.items()
                      if k in STAGES})
    print(f"dumped {jax.default_backend()} stages -> {path}", flush=True)


def compare(path_c, path_t):
    out_c, out_t = np.load(path_c), np.load(path_t)
    g = np.load("/root/repo/tests/golden/harvest_16k.npz")
    gold_vuv = np.asarray(g["vuv"]) > 0.5
    for k in STAGES:
        a, b = out_c[k], out_t[k]
        if a.shape != b.shape:
            print(f"{k:18s} SHAPE MISMATCH {a.shape} vs {b.shape}")
            continue
        d = np.abs(a - b)
        nz = int(np.sum(d > 0))
        rel = d / np.maximum(np.abs(a), 1e-30)
        print(f"{k:18s} ndiff={nz:7d}/{a.size:8d}  max|d|={d.max():.3e}  "
              f"max rel={rel.max():.3e}")
        if k in ("_f0_base", "_f0_step2", "f0") and nz:
            ax = tuple(range(a.ndim - 1))
            frames = np.where(np.any(d > 0, axis=ax) if a.ndim > 1
                              else d > 0)[0]
            print(f"    differing frames ({len(frames)}): {frames[:40]}")
    vuv_t = out_t["f0"] > 0
    flips = np.where(vuv_t != gold_vuv)[0]
    print(f"TPU-vs-golden vuv flips: {len(flips)} at {flips}")
    vuv_c = out_c["f0"] > 0
    flips_c = np.where(vuv_c != gold_vuv)[0]
    print(f"CPU-f32-vs-golden vuv flips: {len(flips_c)} at {flips_c}")


def main():
    mode = sys.argv[1]
    if mode == "dump":
        backend, path = sys.argv[2], sys.argv[3]
        dump(path, backend=backend)
    elif mode == "compare":
        compare(sys.argv[2], sys.argv[3])
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
