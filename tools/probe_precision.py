"""Fast precision gate probe (subset of verify_tpu for config decisions).

1. frames.uniform_frames on device must equal the host result BITWISE
   (the 3-pass split extraction contract; r5 root-cause fix).
2. harvest encode at 22.05 kHz AND 16 kHz vs the f64 goldens: vuv flips
   and voiced F0 RMSE — the strict bars that decide whether a cheaper FFT
   precision (WORLD_TPU_FFT_PRECISION=high) is admissible.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           [WORLD_TPU_FFT_PRECISION=high] python tools/probe_precision.py
"""
import os

import numpy as np
from scipy.io import wavfile

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def main():
    from world_tpu.dsp.fftmm import _DMAX, _PH

    print(f"fft precision: {_PH}  direct-DFT max n: {_DMAX}", flush=True)

    # --- 1: extraction exactness ---------------------------------------
    from world_tpu.frames import uniform_frames

    rng = np.random.RandomState(3)
    x = rng.randn(40000).astype(np.float32)
    fn = jax.jit(lambda x: uniform_frames(x, 110.25, 900, 613, -306))
    dev = np.asarray(fn(jnp.asarray(x)))
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        host = np.asarray(fn(jnp.asarray(x)))
    bit = np.array_equal(dev, host)
    print("extraction bitwise TPU==CPU:", bit, flush=True)
    assert bit

    # --- 2: golden bars at both rates ----------------------------------
    from world_tpu import World

    for tag, golden in (("22k", "/root/repo/tests/golden/harvest.npz"),
                        ("16k", "/root/repo/tests/golden/harvest_16k.npz")):
        g = np.load(golden)
        if tag == "22k":
            fs, xi = wavfile.read("/root/reference/test/test-mwm.wav")
            x = (xi / (2 ** 15 - 1)).astype(np.float32)
        else:
            fs, x = int(g["fs"]), np.asarray(g["x16"], np.float32)
        w = World()
        dat = w.encode(int(fs), x, f0_method="harvest", is_requiem=True)
        f0 = np.asarray(dat["f0"], np.float64)
        gf = np.asarray(g["f0"], np.float64)
        n = min(len(f0), len(gf))
        f0, gf = f0[:n], gf[:n]
        vp, vg = f0 > 0, gf > 0
        flips = int(np.sum(vp != vg))
        both = vp & vg
        rmse = float(np.sqrt(np.mean((f0[both] - gf[both]) ** 2)))
        print(f"{tag}: vuv flips {flips}/{n}  voiced RMSE {rmse:.4f} Hz",
              flush=True)
        assert flips == 0 or flips / n < 0.01, (tag, flips)
        assert rmse < 1.0, (tag, rmse)
    print("PROBE OK", flush=True)


if __name__ == "__main__":
    main()
