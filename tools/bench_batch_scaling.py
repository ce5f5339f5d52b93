"""Batch-scaling experiment on the real TPU: throughput vs vmap batch size.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_batch_scaling.py [B ...]

Times the full harvest+requiem encode+decode pipeline single-stream and at
each requested vmap batch size, with the axon timing discipline (enqueue K,
one checksum fetch).  Also checks the parity gate (row 0 vs single-stream)
for each batch size.
"""
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from scipy.io import wavfile

from world_tpu.parallel.batch import _encode_decode_one
from world_tpu.synth.seeds import get_seeds_signals


def checksum(out):
    return (jnp.sum(out["y"]) + jnp.sum(out["f0"]) + jnp.sum(out["spectrogram"])
            + jnp.sum(out["band_aperiodicity"]))


def main():
    batch_sizes = [int(a) for a in sys.argv[1:]] or [4, 8, 16]
    fs, x_int16 = wavfile.read("/root/reference/test/test-mwm.wav")
    x = (x_int16 / (2 ** 15 - 1)).astype(np.float32)
    audio_seconds = len(x) / fs
    seeds = get_seeds_signals(int(fs))
    pulse = jnp.asarray(np.asarray(seeds["pulse"], dtype=np.float32))
    noise = jnp.asarray(np.asarray(seeds["noise"], dtype=np.float32))
    xj = jnp.asarray(x)

    n_bands = int(np.ceil(np.log2((800 * 1.1) / (71 * 0.9)) * 40))
    max_candidates = int(n_bands / 10 + 0.5)

    def one(xi):
        return _encode_decode_one(xi, pulse, noise, fs=int(fs), frame_period=5,
                                  max_pulses=8192,
                                  max_candidates=max_candidates,
                                  max_sections=256)

    step1 = jax.jit(lambda x: one(x))

    def throughput(fn, arg, per_call_utts, K, reps=3):
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            acc = []
            for _ in range(K):
                acc.append(checksum(fn(arg)))
            float(jnp.sum(jnp.stack(acc)))
            wall = time.perf_counter() - t0
            best = wall if best is None else min(best, wall)
        return audio_seconds * per_call_utts / (best / K), best / K

    t0 = time.perf_counter()
    out1 = step1(xj)
    float(checksum(out1))
    print(f"single: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    xrt1, per1 = throughput(step1, xj, 1, 16)
    print(f"B=1  {xrt1:8.1f} xRT   ({per1*1000:.1f} ms/call)", flush=True)
    f0_s = np.asarray(out1["f0"])

    for B in batch_sizes:
        xb = jnp.asarray(np.stack([x] * B))
        stepb = jax.jit(jax.vmap(one))
        t0 = time.perf_counter()
        outb = stepb(xb)
        float(checksum(outb))
        print(f"B={B}: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
        f0_b = np.asarray(outb["f0"][0])
        flips = int(np.sum((f0_s > 0) != (f0_b > 0)))
        big = int(np.sum(np.abs(f0_s - f0_b) > 0.5))
        K = max(2, 16 // B)
        xrtb, perb = throughput(stepb, xb, B, K)
        gate = "PASS" if flips == 0 and big <= max(5, int(0.01 * f0_s.size)) else "FAIL"
        print(f"B={B:<3d}{xrtb:8.1f} xRT   ({perb*1000:.1f} ms/call, "
              f"{perb*1000/B:.1f} ms/utt)  gate={gate} flips={flips} big={big}",
              flush=True)


if __name__ == "__main__":
    main()
