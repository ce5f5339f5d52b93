"""xRT benchmark for every BASELINE.md config on the real TPU.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_paths.py

Measures per-chip throughput (audio-seconds per wall second) for:
  * dio+stonemask+cheaptrick+d4c encode      (BASELINE config 1, ref 2.79 s)
  * classic round-trip encode+decode          (BASELINE config 2, ref 3.40 s)
  * harvest+cheaptrick+d4cRequiem encode+decode (BASELINE configs 3/6,
    ref 27.2 s + 0.32 s — the bench.py headline)
  * swipe get_f0                              (BASELINE config 7, ref 0.56 s)

Timing discipline per tools/axon_timing.py: enqueue K calls back-to-back,
pay ONE checksum fetch (block_until_ready does not sync through the axon
tunnel).  Prints a JSON table at the end.
"""
import json
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from scipy.io import wavfile

from world_tpu.f0.swipe import _static_config, _swipe_core
from world_tpu.parallel.batch import (_encode_classic_one,
                                      _encode_decode_classic_one,
                                      _encode_decode_one)
from world_tpu.synth.seeds import get_seeds_signals


def checksum(out):
    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
    acc = 0.0
    for l in leaves:
        acc = acc + jnp.sum(jnp.abs(l.astype(jnp.float32)))
    return acc


def throughput(fn, args, audio_seconds, utts=1, K=16, reps=3):
    out = fn(*args)
    float(checksum(out))  # compile + warm
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        acc = []
        for _ in range(K):
            acc.append(checksum(fn(*args)))
        float(jnp.sum(jnp.stack(acc)))
        wall = time.perf_counter() - t0
        best = wall if best is None else min(best, wall)
    per_call = best / K
    return audio_seconds * utts / per_call, per_call


def main():
    fs, x_int16 = wavfile.read("/root/reference/test/test-mwm.wav")
    fs = int(fs)
    x = (x_int16 / (2 ** 15 - 1)).astype(np.float32)
    audio_s = len(x) / fs
    xj = jnp.asarray(x)
    key = jax.random.PRNGKey(0)

    results = {}

    # --- config 1: dio+stonemask encode ---------------------------------
    enc = jax.jit(lambda x: _encode_classic_one(x, fs=fs, frame_period=5))
    t0 = time.perf_counter()
    xrt, per = throughput(enc, (xj,), audio_s)
    results["dio_encode"] = {"xrt": round(xrt, 1), "ms_per_call":
                             round(per * 1000, 2),
                             "ref_s": 2.79, "speedup": round(xrt / (audio_s / 2.79), 1)}
    print(f"dio encode        {xrt:9.1f} xRT  ({per*1000:6.1f} ms)  "
          f"[{time.perf_counter()-t0:.0f}s incl compile]", flush=True)

    # --- config 2: classic round-trip ------------------------------------
    rt = jax.jit(lambda x, k: _encode_decode_classic_one(x, k, fs=fs,
                                                         frame_period=5))
    t0 = time.perf_counter()
    xrt, per = throughput(rt, (xj, key), audio_s)
    results["classic_roundtrip"] = {"xrt": round(xrt, 1),
                                    "ms_per_call": round(per * 1000, 2),
                                    "ref_s": 2.79 + 0.61,
                                    "speedup": round(xrt / (audio_s / 3.40), 1)}
    print(f"classic roundtrip {xrt:9.1f} xRT  ({per*1000:6.1f} ms)  "
          f"[{time.perf_counter()-t0:.0f}s incl compile]", flush=True)

    # --- configs 3/6: harvest + requiem round-trip ------------------------
    seeds = get_seeds_signals(fs)
    pulse = jnp.asarray(np.asarray(seeds["pulse"], np.float32))
    noise = jnp.asarray(np.asarray(seeds["noise"], np.float32))
    n_bands = int(np.ceil(np.log2((800 * 1.1) / (71 * 0.9)) * 40))
    max_candidates = int(n_bands / 10 + 0.5)
    hv = jax.jit(lambda x, p, n: _encode_decode_one(
        x, p, n, fs=fs, frame_period=5, max_pulses=8192,
        max_candidates=max_candidates, max_sections=256))
    t0 = time.perf_counter()
    xrt, per = throughput(hv, (xj, pulse, noise), audio_s)
    results["harvest_requiem_roundtrip"] = {
        "xrt": round(xrt, 1), "ms_per_call": round(per * 1000, 2),
        "ref_s": 27.2 + 0.32, "speedup": round(xrt / (audio_s / 27.52), 1)}
    print(f"harvest roundtrip {xrt:9.1f} xRT  ({per*1000:6.1f} ms)  "
          f"[{time.perf_counter()-t0:.0f}s incl compile]", flush=True)

    # --- config 7: swipe get_f0 -------------------------------------------
    cfg = _static_config(fs, (71, 800), 1 / 96, 0.1, 2)
    num_samples = int(1000 * len(x) / fs / 5 + 1)
    t = jnp.asarray(np.arange(num_samples) * 0.005, jnp.float32)
    sw = jax.jit(lambda x: _swipe_core(x, cfg, float(fs), t, 0.3))
    t0 = time.perf_counter()
    xrt, per = throughput(sw, (xj,), audio_s)
    results["swipe_f0"] = {"xrt": round(xrt, 1),
                           "ms_per_call": round(per * 1000, 2),
                           "ref_s": 0.56, "speedup": round(xrt / (audio_s / 0.56), 1)}
    print(f"swipe get_f0      {xrt:9.1f} xRT  ({per*1000:6.1f} ms)  "
          f"[{time.perf_counter()-t0:.0f}s incl compile]", flush=True)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
