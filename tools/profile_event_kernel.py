"""Device timing + twin-check of the fused event-engine kernel on the real
harvest shapes (608 rows x ~34k samples, Q=4645).

Knobs via env: WORLD_TPU_EVENT_LB (cummax block), WORLD_TPU_EVENT_QBT
(frames per sampling block).  Both are bitwise-neutral by construction;
this tool verifies that empirically against the XLA twin on every run.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_event_kernel.py
"""
import os
import time

import numpy as np
from scipy.io import wavfile

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def main():
    import importlib

    H = importlib.import_module("world_tpu.f0.harvest")
    E = importlib.import_module("world_tpu.ops.edge_interp")
    from tools.axon_timing import device_time
    from world_tpu.dsp.fir import fir_bank_full

    print("LB", E._LB, "QBT", getattr(E, "_QBT", None), flush=True)

    fs, x_int16 = wavfile.read("/root/reference/test/test-mwm.wav")
    fs = int(fs)
    x = jnp.asarray((x_int16 / (2 ** 15 - 1)).astype(np.float32))
    signal_length = x.shape[0]
    num_samples = int(1000 * signal_length / fs + 1)
    basic_tp = jnp.asarray(np.arange(num_samples) / 1000, dtype=x.dtype)
    adj_floor, adj_ceil = 71.0 * 0.9, 800.0 * 1.1
    boundary_f0_list = adj_floor * 2.0 ** (
        (np.arange(np.ceil(np.log2(adj_ceil / adj_floor) * 40)) + 1) / 40)

    y, actual_fs = jax.jit(lambda x: H.downsample(x, fs, 8000))(x)
    actual_fs = float(actual_fs)
    y_len = y.shape[0]
    bank, bias = H._band_filter_bank(np.asarray(boundary_f0_list), actual_fs)

    @jax.jit
    def sig4_fn(y):
        conv = fir_bank_full(y, bank)
        filtered = jnp.stack([conv[b, int(s): int(s) + y_len]
                              for b, s in enumerate(bias)])
        d = jnp.diff(filtered, axis=1)
        d_pad = jnp.concatenate([d, d[:, -1:]], axis=1)
        return jnp.concatenate([filtered, -filtered, d_pad, -d_pad], axis=0)

    sig4 = jax.block_until_ready(sig4_fn(y))
    stride = actual_fs * 0.001
    print("rows", sig4.shape[0], "n", sig4.shape[1], "Q", num_samples,
          flush=True)

    fn = jax.jit(lambda s: E.interval_interp(s, actual_fs, basic_tp, stride))
    per, (f0k, mk) = device_time(fn, sig4, k=8, label="event engine")
    print(f"event engine: {per*1000:.2f} ms/call", flush=True)

    # twin check (XLA path, same device): near-identity expected
    from world_tpu.f0.events import batched_interval_interp
    tw = jax.jit(lambda s: batched_interval_interp(s, actual_fs, basic_tp,
                                                   stride))
    f0t, mt = jax.block_until_ready(tw(sig4))
    gk, gt = np.asarray(f0k, np.float64), np.asarray(f0t, np.float64)
    both_nan = np.isnan(gk) & np.isnan(gt)
    gk, gt = np.where(both_nan, 0, gk), np.where(both_nan, 0, gt)
    rel = np.abs(gk - gt) / np.maximum(np.abs(gt), 1e-12)
    print("twin: m equal", bool(np.array_equal(np.asarray(mk),
                                               np.asarray(mt))),
          "max rel f0 diff", float(rel.max()), flush=True)


if __name__ == "__main__":
    main()
