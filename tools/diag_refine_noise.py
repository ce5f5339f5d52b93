"""Attribute the 16 kHz refinement-score noise to kernel vs backend.

The candidate-selection argmax (search_f0_base) flips between backends when
its input scores carry percent-level noise.  This tool evaluates the SAME
refinement inputs (the CPU pipeline's compacted candidate grid, rebuilt from
a diag_16k_flips dump) through each path and reports score error vs an
f64 XLA-twin oracle:

  * xla-f64 (cpu)  — oracle
  * xla-f32 (cpu)  — the production CPU path
  * xla-f32 (tpu)  — the XLA twin compiled for TPU (backend effects only)
  * pallas   (tpu) — the production TPU kernel (kernel + backend effects)

Usage:
  python tools/diag_16k_flips.py dump cpu /tmp/h16_cpu.npz   # once
  PYTHONPATH=... python tools/diag_refine_noise.py cpu /tmp/h16_cpu.npz
  PYTHONPATH=... python tools/diag_refine_noise.py tpu /tmp/h16_cpu.npz
"""
import sys

import numpy as np


def build_inputs(dump_path):
    """Rebuild (y, basic_tp, compact) exactly as _harvest_core does, with the
    compaction replayed in numpy from the dumped _cands_overlap stage."""
    import jax
    import jax.numpy as jnp

    from world_tpu.f0.harvest import downsample

    g = np.load("/root/repo/tests/golden/harvest_16k.npz")
    fs = int(g["fs"])
    x = np.asarray(g["x16"], np.float32)
    dump = np.load(dump_path)
    cands1 = np.asarray(dump["_cands_overlap"], np.float32)  # (C, F)

    import os
    if os.environ.get("DIAG_Y_FROM"):
        # decompose backend noise: reuse another backend's decimated signal
        # so the comparison isolates the refine path from decimator ulp noise
        yz = np.load(os.environ["DIAG_Y_FROM"])
        y, actual_fs = yz["y"], float(yz["actual_fs"])
    else:
        y, actual_fs = downsample(jnp.asarray(x), fs, 8000)
        if os.environ.get("DIAG_Y_TO"):
            np.savez(os.environ["DIAG_Y_TO"], y=np.asarray(y, np.float32),
                     actual_fs=float(actual_fs))
    f0_floor, f0_ceil = 71.0, 800.0
    max_half = int(np.ceil(3 * actual_fs / f0_floor / 2))
    num_samples = int(1000 * x.shape[0] / fs / 1 + 1)
    basic_tp = np.arange(num_samples, dtype=np.float32) / 1000.0

    # numpy replay of the rank-select compaction (first C2 nonzeros per
    # frame, original order) — integer-exact, backend-independent
    C2 = min(48, cands1.shape[0])
    C, F = cands1.shape
    compact = np.zeros((C2, F), np.float32)
    for f in range(F):
        nz = cands1[:, f][cands1[:, f] != 0]
        compact[: min(C2, nz.size), f] = nz[:C2]
    return (np.asarray(y, np.float32), float(actual_fs), basic_tp, compact,
            f0_floor, f0_ceil, max_half)


def run_path(tag, inputs, dtype, force_xla):
    import jax
    import jax.numpy as jnp

    from world_tpu.f0.harvest import refine_candidates
    from world_tpu.ops import refine_dft

    y, actual_fs, tp, compact, f0_floor, f0_ceil, max_half = inputs
    if force_xla:
        orig = refine_dft.on_tpu
        refine_dft.on_tpu = lambda: False
    try:
        # jit the whole call: eager dispatch through the axon tunnel pays a
        # host round-trip per op and takes tens of minutes
        fn = jax.jit(lambda yj, tj, cj: refine_candidates(
            yj, actual_fs, tj, cj, f0_floor, f0_ceil, max_half,
            stride_samples=actual_fs * 0.001))
        ref, score = fn(jnp.asarray(y, dtype), jnp.asarray(tp, dtype),
                        jnp.asarray(compact, dtype))
        out = {"ref": np.asarray(ref, np.float64),
               "score": np.asarray(score, np.float64)}
    finally:
        if force_xla:
            refine_dft.on_tpu = orig
    print(f"computed {tag}", flush=True)
    return out


def main():
    backend, dump_path = sys.argv[1], sys.argv[2]
    import jax

    if backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    inputs = build_inputs(dump_path)
    # key result files by a hash of the dump inputs: a stale oracle from a
    # previous dump (different input or code version) must never be
    # silently compared against fresh results (round-3 advisor finding)
    import hashlib
    ih = hashlib.sha256()
    for a in jax.tree_util.tree_leaves(inputs):
        ih.update(np.ascontiguousarray(np.asarray(a)).tobytes())
    tag = ih.hexdigest()[:12]
    if backend == "cpu":
        np.savez(f"/tmp/refine_f64_{tag}.npz",
                 **run_path("xla-f64 cpu", inputs, jnp.float64, True))
        np.savez(f"/tmp/refine_f32_cpu_{tag}.npz",
                 **run_path("xla-f32 cpu", inputs, jnp.float32, True))
    else:
        np.savez(f"/tmp/refine_f32_tpu_xla_{tag}.npz",
                 **run_path("xla-f32 tpu", inputs, jnp.float32, True))
        np.savez(f"/tmp/refine_f32_tpu_pallas_{tag}.npz",
                 **run_path("pallas tpu", inputs, jnp.float32, False))

    # report whatever pairs exist FOR THIS DUMP's hash
    import os
    if not os.path.exists(f"/tmp/refine_f64_{tag}.npz"):
        return
    oracle = np.load(f"/tmp/refine_f64_{tag}.npz")
    nz = oracle["score"] > 0
    for name, path in [("xla-f32 cpu", f"/tmp/refine_f32_cpu_{tag}.npz"),
                       ("xla-f32 tpu", f"/tmp/refine_f32_tpu_xla_{tag}.npz"),
                       ("pallas  tpu",
                        f"/tmp/refine_f32_tpu_pallas_{tag}.npz")]:
        if not os.path.exists(path):
            continue
        d = np.load(path)
        both = nz & (d["score"] > 0)
        rel = (np.abs(d["score"][both] - oracle["score"][both])
               / oracle["score"][both])
        relf = (np.abs(d["ref"][both] - oracle["ref"][both])
                / np.maximum(oracle["ref"][both], 1e-12))
        dis = int(np.sum(nz != (d["score"] > 0)))
        print(f"{name}: score relerr p50={np.percentile(rel,50):.2e} "
              f"p99={np.percentile(rel,99):.2e} max={rel.max():.2e}  "
              f"f0 relerr p50={np.percentile(relf,50):.2e} "
              f"p99={np.percentile(relf,99):.2e}  zero-mismatch={dis}")


if __name__ == "__main__":
    main()
