"""Fine-grained TPU timing inside raw_band_candidates + d4c_requiem."""
import numpy as np
from scipy.io import wavfile

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


def timed(fn, *args, label=""):
    from tools.axon_timing import device_time
    per_call, out = device_time(fn, *args, k=8, label=label, verbose=True)
    return out


def main():
    import importlib
    H = importlib.import_module("world_tpu.f0.harvest")
    from world_tpu.dsp.fir import fir_bank_full
    from world_tpu.ops.edge_interp import interval_interp

    fs, x_int16 = wavfile.read("/root/reference/test/test-mwm.wav")
    fs = int(fs)
    x = jnp.asarray((x_int16 / (2 ** 15 - 1)).astype(np.float32))
    signal_length = x.shape[0]
    f0_floor, f0_ceil = 71.0, 800.0
    target_fs = 8000
    num_samples = int(1000 * signal_length / fs + 1)
    basic_tp = jnp.asarray(np.arange(num_samples) / 1000, dtype=x.dtype)
    adj_floor, adj_ceil = f0_floor * 0.9, f0_ceil * 1.1
    boundary_f0_list = adj_floor * 2.0 ** (
        (np.arange(np.ceil(np.log2(adj_ceil / adj_floor) * 40)) + 1) / 40)

    y, actual_fs = jax.jit(lambda x: H.downsample(x, fs, target_fs))(x)
    actual_fs = float(actual_fs)
    y_len = y.shape[0]
    print("y_len", y_len, "bands", len(boundary_f0_list))

    bank, bias = H._band_filter_bank(np.asarray(boundary_f0_list), actual_fs)
    print("bank", bank.shape)

    @jax.jit
    def filt_fn(y):
        conv = fir_bank_full(y, bank)
        return jnp.stack([conv[b, int(s): int(s) + y_len]
                          for b, s in enumerate(bias)])
    filtered = timed(filt_fn, y, label="fir_bank+slice")

    @jax.jit
    def stack4_fn(filtered):
        d = jnp.diff(filtered, axis=1)
        d_pad = jnp.concatenate([d, d[:, -1:]], axis=1)
        return jnp.concatenate([filtered, -filtered, d_pad, -d_pad], axis=0)
    sig4 = timed(stack4_fn, filtered, label="stack4")

    stride = actual_fs * 0.001

    @jax.jit
    def ev_fn(sig4):
        return interval_interp(sig4, actual_fs, basic_tp, stride)
    interp, m = timed(ev_fn, sig4, label="interval_interp(pallas)")

    @jax.jit
    def tail_fn(interp, m):
        B = filtered.shape[0]
        interps = jnp.stack([interp[:B], interp[B:2*B], interp[2*B:3*B],
                             interp[3*B:]])
        counts = jnp.stack([m[:B], m[B:2*B], m[2*B:3*B], m[3*B:]])
        usable = jnp.all(counts >= 3, axis=0)
        mean_f0 = jnp.mean(interps, axis=0)
        bf = jnp.asarray(boundary_f0_list, dtype=y.dtype)[:, None]
        bad = ((mean_f0 > bf * 1.1) | (mean_f0 < bf * 0.9)
               | (mean_f0 > f0_ceil) | (mean_f0 < f0_floor))
        return jnp.where(bad | ~usable[:, None], 0.0, mean_f0)
    timed(tail_fn, interp, m, label="tail(mean/bounds)")

    # ---- d4c_requiem sub-stages -------------------------------------------
    D = importlib.import_module("world_tpu.aperiodicity.d4c_requiem")
    print("d4c_requiem fns:", [n for n in dir(D) if not n.startswith("__")])


if __name__ == "__main__":
    main()
