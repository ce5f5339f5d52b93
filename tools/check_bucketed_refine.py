"""Isolated TPU check of the f0-bucketed refinement path: compiles only the
bucketed refine stage (not the whole pipeline), compares against the
single-bucket kernel, and times both.  Run:

    PYTHONPATH=/root/repo:/root/.axon_site python -u tools/check_bucketed_refine.py
"""
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def main():
    from world_tpu.f0.harvest import _bucket_caps, _refine_block, _refine_bucketed

    actual_fs = 7350.0
    f0_floor, f0_ceil = 71.0, 800.0
    max_half = int(np.ceil(3 * actual_fs / f0_floor / 2))
    W = 2 * max_half + 1
    C2, F = 48, 4645          # production grid size (overlapped cands, 1ms frames)
    print("caps:", _bucket_caps(max_half), flush=True)

    rng = np.random.RandomState(3)
    seg = jnp.asarray(rng.randn(F, W).astype(np.float32))
    t_c = jnp.asarray((np.arange(F) / 1000.0).astype(np.float32))
    f0 = rng.rand(C2, F).astype(np.float32) * 720 + 75
    f0[rng.rand(C2, F) < 0.55] = 0.0
    cands = jnp.asarray(f0)

    single = jax.jit(lambda s, t, c: _refine_block(
        s, t, c, actual_fs, f0_floor, f0_ceil, max_half))
    bucketed = jax.jit(lambda s, t, c: _refine_bucketed(
        s, t, c, actual_fs, f0_floor, f0_ceil, max_half))

    for name, fn in [("single", single), ("bucketed", bucketed)]:
        t0 = time.perf_counter()
        r, sc = fn(seg, t_c, cands)
        chk = float(jnp.sum(r) + jnp.sum(sc))
        print(f"{name}: compile+run {time.perf_counter()-t0:.1f}s "
              f"checksum {chk:.6g}", flush=True)

    r0, s0 = single(seg, t_c, cands)
    r1, s1 = bucketed(seg, t_c, cands)
    d = float(jnp.max(jnp.abs(r0 - r1)))
    ds = float(jnp.max(jnp.abs(s0 - s1)))
    print(f"max |d_refined| {d:.3e}  max |d_score| {ds:.3e}", flush=True)

    from tools.axon_timing import device_time
    device_time(single, seg, t_c, cands, k=16, label="single")
    device_time(bucketed, seg, t_c, cands, k=16, label="bucketed")


if __name__ == "__main__":
    main()
